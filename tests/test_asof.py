"""Edge tests for events.asof_join (the point-in-time join): tie-break
determinism, exact-timestamp matches, tolerance blanking, users with no
right-side rows, and cross-block co-location — all compared against a
brute-force per-row reference over the same rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from torchtrajectory_ray.pipelines.events import asof_join


def _write_events_dir(tmp_path, frames):
    """events.parquet as a DIRECTORY of one file per frame — each file
    is (at least) one Ray block, so the hash exchange must really move
    a user's rows together."""
    d = tmp_path / "events.parquet"
    d.mkdir()
    for i, df in enumerate(frames):
        df = df.copy()
        df["ts"] = pd.to_datetime(df["t_us"], unit="us")
        df["props"] = "{}"
        df = df[["event_id", "ts", "user_id", "event_type", "value", "props"]]
        pq.write_table(pa.Table.from_pandas(df), str(d / f"part-{i}.parquet"))
    return str(tmp_path)


def _brute(frames, left="click", right="purchase", tol=None):
    """Per-row reference: latest prior-or-equal right event for the same
    user, largest event_id at a tied timestamp, -1/0.0 when unmatched or
    older than tol."""
    all_df = pd.concat(frames, ignore_index=True)
    a = all_df[all_df.event_type == left]
    b = all_df[all_df.event_type == right]
    rows = []
    for _, r in a.iterrows():
        c = b[(b.user_id == r.user_id) & (b.t_us <= r.t_us)]
        if tol is not None and len(c):
            c = c[r.t_us - c.t_us <= tol]
        if len(c):
            best_t = c.t_us.max()
            w = c[c.t_us == best_t].sort_values("event_id").iloc[-1]
            m = (int(w.event_id), int(w.t_us), float(w.value))
        else:
            m = (-1, -1, 0.0)
        rows.append((int(r.event_id), int(r.user_id), int(r.t_us)) + m)
    return (
        pd.DataFrame(
            rows,
            columns=[
                "event_id", "user_id", "ts_us",
                "match_event_id", "match_ts_us", "match_value",
            ],
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _run(sf, **kw):
    return (
        asof_join(sf, **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_tie_break_largest_event_id_and_exact_match(ray_session, tmp_path):
    # two purchases at the SAME (user, ts): the larger event_id must win;
    # a click AT that ts matches (<= semantics), one just before misses
    frames = [
        pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4],
                "user_id": [7, 7, 7, 7],
                "event_type": ["purchase", "purchase", "click", "click"],
                "t_us": [1_000, 1_000, 1_000, 999],
                "value": [10.0, 20.0, 0.0, 0.0],
            }
        )
    ]
    sf = _write_events_dir(tmp_path, frames)
    got = _run(sf)
    exp = _brute(frames)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)
    # the tied winner is event 2 (value 20.0), picked at the exact ts
    hit = got[got.event_id == 3].iloc[0]
    assert hit.match_event_id == 2 and hit.match_value == 20.0
    assert got[got.event_id == 4].iloc[0].match_event_id == -1


def test_unmatched_users_and_empty_sides(ray_session, tmp_path):
    # user 1 has clicks but no purchases; user 2 has only purchases
    # (contributes no output rows); user 3 interleaves
    frames = [
        pd.DataFrame(
            {
                "event_id": [1, 2],
                "user_id": [1, 2],
                "event_type": ["click", "purchase"],
                "t_us": [5_000, 5_000],
                "value": [0.0, 9.0],
            }
        ),
        pd.DataFrame(
            {
                "event_id": [3, 4, 5],
                "user_id": [3, 3, 3],
                "event_type": ["purchase", "click", "click"],
                "t_us": [1_000, 2_000, 500],
                "value": [7.0, 0.0, 0.0],
            }
        ),
    ]
    sf = _write_events_dir(tmp_path, frames)
    got = _run(sf)
    exp = _brute(frames)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)
    assert got[got.event_id == 1].iloc[0].match_event_id == -1  # no b rows
    assert got[got.event_id == 5].iloc[0].match_event_id == -1  # b later
    assert got[got.event_id == 4].iloc[0].match_event_id == 3


def test_cross_block_colocation(ray_session, tmp_path):
    # a user's click and its matching purchase live in DIFFERENT files:
    # only the exchange makes them meet
    rng = np.random.default_rng(7)
    n = 400
    users = rng.integers(0, 23, n)
    base = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": users,
            "event_type": rng.choice(["click", "purchase", "view"], n),
            "t_us": rng.integers(0, 1_000_000, n),
            "value": np.round(rng.uniform(0, 100, n), 3),
        }
    )
    frames = [base.iloc[i::5].reset_index(drop=True) for i in range(5)]
    sf = _write_events_dir(tmp_path, frames)
    exp = _brute(frames)
    pd.testing.assert_frame_equal(_run(sf), exp, check_dtype=True)
    # tolerance: the same join with a window only BLANKS stale matches
    tol = 200_000
    got_tol = _run(sf, tolerance_us=tol)
    exp_tol = _brute(frames, tol=tol)
    pd.testing.assert_frame_equal(got_tol, exp_tol, check_dtype=True)
    stale = (exp.match_event_id != -1) & (exp_tol.match_event_id == -1)
    assert stale.any()  # the window really blanked something
    kept = exp_tol.match_event_id != -1
    assert (exp.match_event_id[kept] == exp_tol.match_event_id[kept]).all()
