"""Edge tests for the behavioral-analytics continuation batch: cohort
retention, grouped distinct counts (hourly active users), Markov event
transitions, grouped MAD, and WITH-TIES top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_SMALL = "/root/testdata/sf0.001"


def _write_events(tmp_path, df, n_parts=3):
    d = tmp_path / "events.parquet"
    d.mkdir(parents=True)
    for i, part in enumerate(np.array_split(df, n_parts)):
        pq.write_table(
            pa.Table.from_pandas(part.copy(), preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    return str(tmp_path)


def _events_df(user_id, ts_s, event_type, value):
    n = len(user_id)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # µs precision to match the real events table's timestamp[us]
            "ts": pd.to_datetime(np.asarray(ts_s, np.int64), unit="s").astype(
                "datetime64[us]"
            ),
            "user_id": np.asarray(user_id, np.int64),
            "event_type": event_type,
            "value": np.asarray(value, np.float64),
            "props": "{}",
        }
    )


def test_cohort_offset_zero_counts_every_user_once(ray_session):
    """Every user appears in their cohort at offset 0 exactly once, so
    Σ n_users over offset-0 rows == the corpus's distinct-user count."""
    from torchtrajectory_ray.pipelines.events import cohort_retention

    out = cohort_retention(SF_SMALL)
    n_users = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["user_id"]
    )
    distinct = len(np.unique(n_users["user_id"].to_numpy()))
    zero = out[out["offset_days"] == 0]["n_users"].sum()
    assert int(zero) == distinct
    # offsets never negative, cohorts are day-aligned
    assert (out["offset_days"] >= 0).all()
    assert (out["cohort_day_us"] % 86_400_000_000 == 0).all()


def test_cohort_split_across_batches(ray_session, tmp_path):
    """A user's first day must win across file/batch boundaries: user 1
    active on days 3,0,5 split over three files → cohort day 0 with
    offsets {0,3,5}."""
    from torchtrajectory_ray.pipelines.events import cohort_retention

    day = 86_400
    df = _events_df(
        user_id=[1, 1, 1, 2],
        ts_s=[3 * day, 0, 5 * day + 7, day],
        event_type=["view"] * 4,
        value=[0.0] * 4,
    )
    root = _write_events(tmp_path, df, n_parts=3)
    out = cohort_retention(root)
    u1 = out[out["cohort_day_us"] == 0]
    assert sorted(u1["offset_days"].tolist()) == [0, 3, 5]
    assert (u1["n_users"] == 1).all()
    u2 = out[out["cohort_day_us"] == day * 1_000_000]
    assert u2["offset_days"].tolist() == [0] and u2["n_users"].tolist() == [1]


def test_hourly_active_users_dedupes_within_hour(ray_session, tmp_path):
    """Three events from one user inside one hour count once; the same
    user in a second hour counts again."""
    from torchtrajectory_ray.pipelines.events import hourly_active_users

    df = _events_df(
        user_id=[9, 9, 9, 9, 4],
        ts_s=[10, 20, 3599, 3600, 30],
        event_type=["view"] * 5,
        value=[0.0] * 5,
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = hourly_active_users(root)
    assert out["window_start_us"].tolist() == [0, 3_600_000_000]
    assert out["n_users"].tolist() == [2, 1]


def test_transitions_count_identity(ray_session):
    """Σ transitions == n_events − n_distinct_users (each user with n
    events contributes exactly n−1 consecutive pairs)."""
    from torchtrajectory_ray.pipelines.events import event_transitions

    out = event_transitions(SF_SMALL)
    t = pq.read_table(f"{SF_SMALL}/events.parquet", columns=["user_id"])
    n = t.num_rows
    distinct = len(np.unique(t["user_id"].to_numpy()))
    assert int(out["n_transitions"].sum()) == n - distinct


def test_transitions_tie_break_on_event_id(ray_session, tmp_path):
    """Two events at the SAME (user, ts) order by event_id — the pinned
    tie rule shared with event_deltas/the SQL LAG oracle."""
    from torchtrajectory_ray.pipelines.events import event_transitions

    df = _events_df(
        user_id=[5, 5, 5],
        ts_s=[100, 100, 200],
        event_type=["view", "click", "purchase"],
        value=[0.0] * 3,
    )
    root = _write_events(tmp_path, df, n_parts=1)
    out = event_transitions(root)
    got = {
        (r.prev_type, r.next_type): r.n_transitions for r in out.itertuples()
    }
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}


def test_grouped_mad_matches_single_group_mad(ray_session, tmp_path):
    """With one event type, value_mad_by_type must reproduce the global
    value_mad numbers exactly (same selector, same interpolation)."""
    from torchtrajectory_ray.pipelines.events import value_mad, value_mad_by_type

    rng = np.random.default_rng(11)
    vals = rng.normal(loc=3.0, scale=2.0, size=401)
    df = _events_df(
        user_id=np.arange(401) % 13,
        ts_s=np.arange(401),
        event_type=["click"] * 401,
        value=vals,
    )
    root = _write_events(tmp_path, df, n_parts=4)
    grouped = value_mad_by_type(root)
    flat = value_mad(root).set_index("stat")["value"]
    assert grouped["event_type"].tolist() == ["click"]
    assert grouped["median_value"].iloc[0] == flat["median"]
    assert grouped["mad_value"].iloc[0] == flat["mad"]


def test_grouped_mad_median_agrees_with_exact_median_by_type(ray_session):
    from torchtrajectory_ray.pipelines.events import (
        exact_median_by_type,
        value_mad_by_type,
    )

    a = value_mad_by_type(SF_SMALL)[["event_type", "median_value"]]
    b = exact_median_by_type(SF_SMALL)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_top_ties_keeps_full_tie_set(ray_session, tmp_path):
    """k=3 over values with a fat tie AT the threshold returns every
    tied row (RANK <= k semantics, not LIMIT k)."""
    from torchtrajectory_ray.pipelines.events import top_events_ties

    vals = [9.0, 8.0, 7.0, 7.0, 7.0, 1.0, 0.5]
    df = _events_df(
        user_id=np.arange(len(vals)),
        ts_s=np.arange(len(vals)),
        event_type=["view"] * len(vals),
        value=vals,
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = top_events_ties(root, k=3)
    assert sorted(out["value"].tolist(), reverse=True) == [9.0, 8.0, 7.0, 7.0, 7.0]


def test_top_ties_k_larger_than_n(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.events import top_events_ties

    df = _events_df(
        user_id=[0, 1], ts_s=[0, 1], event_type=["view", "click"], value=[2.0, 1.0]
    )
    root = _write_events(tmp_path, df, n_parts=1)
    out = top_events_ties(root, k=10)
    assert len(out) == 2


def test_outlier_boundary_is_strict(ray_session, tmp_path):
    """|v − med| == 3·MAD must NOT qualify (strict >); just beyond must."""
    from torchtrajectory_ray.pipelines.events import value_outliers

    # med = 10, MAD = 1 → threshold 3·MAD = 3: values 7 and 13 sit
    # EXACTLY at the boundary (excluded); only 14 (dev 4) qualifies
    v = np.array([9.0, 10.0, 11.0, 10.0, 10.0, 13.0, 7.0, 14.0])
    med = np.median(v)
    mad = np.median(np.abs(v - med))
    assert (med, mad) == (10.0, 1.0)  # the fixture really is a boundary case
    df = _events_df(
        user_id=np.arange(len(v)),
        ts_s=np.arange(len(v)),
        event_type=["view"] * len(v),
        value=v,
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = value_outliers(root)
    assert out["value"].tolist() == [14.0]


def test_outliers_empty_result_keeps_schema(ray_session, tmp_path):
    """A corpus with no robust outliers returns an EMPTY frame with the
    full typed schema (the all-blocks-empty to_pandas hazard)."""
    from torchtrajectory_ray.pipelines.events import value_outliers

    v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    df = _events_df(
        user_id=np.arange(5), ts_s=np.arange(5), event_type=["view"] * 5, value=v
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = value_outliers(root)
    assert len(out) == 0
    assert list(out.columns) == ["event_id", "user_id", "event_type", "value"]


def test_zscore_standardizes_each_type(ray_session):
    from torchtrajectory_ray.pipelines.events import value_zscore

    out = value_zscore(SF_SMALL).to_pandas()
    t = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["event_id", "event_type", "value"]
    ).to_pandas()
    assert len(out) == len(t)
    for et, grp in out.groupby("event_type"):
        z = grp["zscore"].to_numpy()
        assert abs(z.mean()) < 1e-5
        assert abs(z.std(ddof=1) - 1.0) < 1e-5
    # spot-check one row against a direct pandas computation
    g = t[t["event_type"] == "view"]["value"]
    want = (g.iloc[0] - g.mean()) / g.std(ddof=1)
    got = out.set_index("event_id").loc[
        t[t["event_type"] == "view"]["event_id"].iloc[0], "zscore"
    ]
    assert abs(got - round(want, 6)) <= 1e-6


def test_grouped_ties_keeps_per_group_tie_sets(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.events import top_events_ties_by_type

    df = _events_df(
        user_id=np.arange(8),
        ts_s=np.arange(8),
        event_type=["a", "a", "a", "a", "b", "b", "b", "b"],
        value=[9.0, 7.0, 7.0, 1.0, 5.0, 5.0, 5.0, 0.5],
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = top_events_ties_by_type(root, k=2)
    a = sorted(out[out["event_type"] == "a"]["value"].tolist(), reverse=True)
    b = sorted(out[out["event_type"] == "b"]["value"].tolist(), reverse=True)
    assert a == [9.0, 7.0, 7.0]  # tie AT rank 2 kept whole
    assert b == [5.0, 5.0, 5.0]  # rank-1 tie of three


def test_session_duration_median_known_case(ray_session, tmp_path):
    """One user, three sessions of durations 10 s, 20 s, 100 s (split by
    >30 min gaps) → median 20 s."""
    from torchtrajectory_ray.pipelines.events import session_duration_stats

    h = 3600
    ts = [0, 10, 2 * h, 2 * h + 20, 5 * h, 5 * h + 100]
    df = _events_df(
        user_id=[1] * 6, ts_s=ts, event_type=["view"] * 6, value=[0.0] * 6
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = session_duration_stats(root)
    assert out["n_sessions"].tolist() == [3]
    assert out["median_duration_us"].tolist() == [20_000_000.0]


def test_overlap_join_spanning_and_boundary(ray_session, tmp_path):
    """A session spanning several brackets contributes once to EACH
    bracket it overlaps; a session ending exactly at an edge belongs to
    the bracket left of the edge only (right-open brackets)."""
    from torchtrajectory_ray.pipelines.events import session_bracket_overlap

    # one user, one long session [0, 4000 s]; a second user with a
    # point session at t=1000 s (inside bracket 1 of 4)
    df = _events_df(
        user_id=[1, 1, 2],
        ts_s=[0, 4000, 1000],
        event_type=["view"] * 3,
        value=[0.0] * 3,
    )
    # NOTE: gap 4000 s > 30 min splits user 1 into TWO point sessions
    # at 0 and 4000 → sessions: {[0,0], [4000s,4000s], [1000s,1000s]}
    root = _write_events(tmp_path, df, n_parts=2)
    out = session_bracket_overlap(root, n_brackets=4)
    # span = 4000 s + 1 µs; brackets ≈ [0,1000s+), [1000s,2000s), ...
    assert out["n_sessions"].sum() == 3
    assert set(out["bracket_id"]) <= {0, 1, 2, 3}


def test_overlap_join_long_session_counts_every_bracket(ray_session, tmp_path):
    """A single 2-event session covering the whole span overlaps ALL
    brackets exactly once each."""
    from torchtrajectory_ray.pipelines.events import session_bracket_overlap

    df = _events_df(
        user_id=[1, 1],
        ts_s=[0, 900],  # 15 min gap < 30 min → ONE session [0, 900 s]
        event_type=["view"] * 2,
        value=[0.0] * 2,
    )
    root = _write_events(tmp_path, df, n_parts=1)
    out = session_bracket_overlap(root, n_brackets=8)
    assert out["bracket_id"].tolist() == list(range(8))
    assert out["n_sessions"].tolist() == [1] * 8


def test_event_type_jaccard_known_sets(ray_session, tmp_path):
    """u1 {view, click}, u2 {view}, u3 {click, purchase} →
    J(click,view)=1/3, J(click,purchase)=1/2, J(purchase,view)=0."""
    from torchtrajectory_ray.pipelines.events import event_type_jaccard

    df = _events_df(
        user_id=[1, 1, 1, 2, 3, 3],
        ts_s=[0, 1, 2, 3, 4, 5],
        event_type=["view", "click", "view", "view", "click", "purchase"],
        value=[0.0] * 6,
    )
    root = _write_events(tmp_path, df, n_parts=3)
    out = event_type_jaccard(root).set_index(["type_a", "type_b"])
    assert out.loc[("click", "view"), "n_both"] == 1
    assert out.loc[("click", "view"), "jaccard"] == round(1 / 3, 6)
    assert out.loc[("click", "purchase"), "jaccard"] == 0.5
    assert out.loc[("purchase", "view"), "jaccard"] == 0.0


def test_hau_hll_layout_independent(ray_session, tmp_path):
    """The per-hour HLL estimate is a pure function of the (hour, user)
    set — identical flags and counts at 1 vs 5 file splits."""
    from torchtrajectory_ray.pipelines.events import (
        hourly_active_users_hll_check,
    )

    rng = np.random.default_rng(21)
    n = 2000
    df = _events_df(
        user_id=rng.integers(0, 300, n),
        ts_s=rng.integers(0, 40 * 3600, n),
        event_type=["view"] * n,
        value=[0.0] * n,
    )
    a = hourly_active_users_hll_check(_write_events(tmp_path / "a", df, 1))
    b = hourly_active_users_hll_check(_write_events(tmp_path / "b", df, 5))
    pd.testing.assert_frame_equal(a, b)
    assert (a["within_3sigma"] == 1).all()


def test_stickiness_window_cover(ray_session, tmp_path):
    """A user active on days 0 and 40 (gap > 30) covers two separate
    MAU runs; a user active on days 0 and 10 covers one merged run —
    and MAU(d) counts a user once even with many active days inside
    the window."""
    from torchtrajectory_ray.pipelines.events import user_stickiness

    day = 86_400
    df = _events_df(
        user_id=[1, 1, 2, 2, 2],
        ts_s=[0, 40 * day, 0, 10 * day, 11 * day],
        event_type=["view"] * 5,
        value=[0.0] * 5,
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = user_stickiness(root).set_index("day_us")
    d_us = lambda d: d * day * 1_000_000
    # day 0: both users active → dau 2, mau 2
    assert out.loc[d_us(0), ["dau", "mau"]].tolist() == [2, 2]
    # day 10: only user 2 active; user 1's day-0 activity still inside
    # the trailing 30-day window → mau 2
    assert out.loc[d_us(10), ["dau", "mau"]].tolist() == [1, 2]
    # day 40: user 1 active; user 2's last activity (day 11) is 29 days
    # back → still in window → mau 2, dau 1
    assert out.loc[d_us(40), ["dau", "mau"]].tolist() == [1, 2]
    assert out.loc[d_us(40), "stickiness"] == 0.5


def test_stickiness_mau_counts_user_once(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.events import user_stickiness

    day = 86_400
    # one user active every day for 5 days: mau stays 1 throughout
    df = _events_df(
        user_id=[7] * 5,
        ts_s=[i * day for i in range(5)],
        event_type=["view"] * 5,
        value=[0.0] * 5,
    )
    root = _write_events(tmp_path, df, n_parts=2)
    out = user_stickiness(root)
    assert (out["dau"] == 1).all() and (out["mau"] == 1).all()
    assert (out["stickiness"] == 1.0).all()
