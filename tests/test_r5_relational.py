"""Edge tests for the round-5 relational additions: time_bracket_join
(broadcast range join), rolling_user_mean (window-frame aggregate),
latest_event_per_user (group-wise argmax), and customers_no_orders
(distributed anti-join).  Each is checked against an independent
brute-force reference over the same rows; synthetic inputs are written
as multi-file parquet directories so the exchanges must really move
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from torchtrajectory_ray.pipelines.events import (
    latest_event_per_user,
    rolling_user_mean,
    time_bracket_join,
)
from torchtrajectory_ray.pipelines.analytics import customers_no_orders


def _write_parts(tmp_path, name, frames):
    d = tmp_path / f"{name}.parquet"
    d.mkdir()
    for i, df in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    return str(tmp_path)


def _events_frames(rows):
    """rows: (event_id, user_id, t_us, value, event_type) tuples."""
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "t_us", "value", "event_type"]
    )
    for c in ("event_id", "user_id", "t_us"):
        df[c] = df[c].astype("int64")
    df["value"] = df["value"].astype("float64")
    df["ts"] = pd.to_datetime(df["t_us"], unit="us")
    df["props"] = "{}"
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


# ------------------------------------------------- broadcast range join


def test_time_brackets_boundary_rows(ray_session, tmp_path):
    # span [1000, 1160): with 16 brackets each is 10 µs wide.  Rows sit
    # EXACTLY on edges (right-open: t == lo joins bracket i, t == hi
    # joins i+1), plus tmin and tmax themselves.
    rows = [
        (1, 1, 1000, 1.0, "a"),   # tmin → bracket 0
        (2, 1, 1010, 2.0, "a"),   # exactly edge 1 → bracket 1
        (3, 1, 1019, 4.0, "b"),   # last µs of bracket 1
        (4, 1, 1020, 8.0, "a"),   # edge 2 → bracket 2
        (5, 1, 1159, 16.0, "b"),  # tmax → last bracket (15)
    ]
    sf = _write_parts(tmp_path, "events", [_events_frames(rows)])
    got = time_bracket_join(sf)
    # independent brute force: the same all-integer edge formula, then
    # a pandas interval classification
    tmin, tmax = 1000, 1159
    span = tmax - tmin + 1
    edges = [tmin + (span * i) // 16 for i in range(17)]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "t_us", "value", "event_type"])
    bid = np.searchsorted(np.array(edges), df["t_us"].to_numpy(), side="right") - 1
    df["bracket_id"] = bid
    want = (
        df.groupby(["bracket_id", "event_type"], as_index=False)
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .assign(
            lo_us=lambda d: np.array(edges)[d["bracket_id"]],
            hi_us=lambda d: np.array(edges)[d["bracket_id"] + 1],
        )
        .sort_values(["bracket_id", "event_type"])
        .reset_index(drop=True)
    )[["bracket_id", "lo_us", "hi_us", "event_type", "n_events", "sum_value"]]
    for c in ("bracket_id", "lo_us", "hi_us", "n_events"):
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # the specific boundary placements
    by_eid = df.set_index("event_id")["bracket_id"]
    assert by_eid[1] == 0 and by_eid[2] == 1 and by_eid[3] == 1
    assert by_eid[4] == 2 and by_eid[5] == 15


def test_time_brackets_cover_every_row(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    n = 3000
    rows = [
        (i, int(rng.integers(0, 40)), int(rng.integers(5_000, 9_999_999)),
         float(rng.random()), "xy"[int(rng.integers(0, 2))])
        for i in range(n)
    ]
    frames = [
        _events_frames(rows[i::3]) for i in range(3)
    ]
    sf = _write_parts(tmp_path, "events", frames)
    got = time_bracket_join(sf)
    assert int(got["n_events"].sum()) == n  # no row lost or doubled
    assert got["bracket_id"].between(0, 15).all()
    # brackets tile the span: hi of bracket i == lo of bracket i+1
    b = got.drop_duplicates("bracket_id").sort_values("bracket_id")
    lo, hi = b["lo_us"].to_numpy(), b["hi_us"].to_numpy()
    present = b["bracket_id"].to_numpy()
    for i in range(len(present) - 1):
        if present[i + 1] == present[i] + 1:
            assert hi[i] == lo[i + 1]


# ------------------------------------------------- window-frame rolling


def test_rolling_user_mean_matches_pandas(ray_session, tmp_path):
    rng = np.random.default_rng(23)
    n = 4000
    rows = [
        (i, int(rng.integers(0, 50)), int(rng.integers(0, 10**8)),
         float(rng.random() * 100), "click")
        for i in range(n)
    ]
    frames = [_events_frames(rows[i::4]) for i in range(4)]
    sf = _write_parts(tmp_path, "events", frames)
    got = (
        rolling_user_mean(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "t_us", "value", "event_type"])
    s = df.sort_values(["user_id", "t_us", "event_id"])
    want = (
        s.assign(
            avg3=s.groupby("user_id")["value"]
            .rolling(3, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
            .round(6)
        )[["event_id", "user_id", "avg3"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == n  # every row gets a frame (min_periods=1)
    pd.testing.assert_frame_equal(
        got, want.astype({"event_id": "int64", "user_id": "int64"})
    )


def test_rolling_user_mean_short_users_and_ties(ray_session, tmp_path):
    # user 1: three rows, two at the SAME ts (event_id orders them);
    # user 2: a single row (frame of one).
    rows = [
        (1, 1, 100, 3.0, "a"),
        (2, 1, 100, 9.0, "a"),
        (3, 1, 200, 6.0, "a"),
        (4, 2, 50, 42.0, "a"),
    ]
    sf = _write_parts(
        tmp_path, "events",
        [_events_frames(rows[:2]), _events_frames(rows[2:])],
    )
    got = (
        rolling_user_mean(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "avg3": [3.0, 6.0, 6.0, 42.0],
        }
    )
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------- group-wise argmax


def test_latest_event_per_user_ties_and_blocks(ray_session, tmp_path):
    # user 1's winner is in file 2 (combiner must not pick a local max
    # as global); users 1 and 2 both have ts ties broken by event_id.
    f1 = _events_frames([(1, 1, 100, 1.0, "a"), (3, 2, 500, 3.0, "b")])
    f2 = _events_frames(
        [(2, 1, 300, 2.0, "c"), (5, 1, 300, 5.0, "d"), (4, 2, 500, 4.0, "e")]
    )
    sf = _write_parts(tmp_path, "events", [f1, f2])
    got = (
        latest_event_per_user(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": [1, 2],
            "event_id": [5, 4],  # ties at (1,300) and (2,500) → max id
            "ts_us": [300, 500],
            "event_type": ["d", "e"],
            "value": [5.0, 4.0],
        }
    )
    pd.testing.assert_frame_equal(got, want.astype({"user_id": "int64", "event_id": "int64", "ts_us": "int64"}))


def test_latest_event_per_user_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    n = 5000
    rows = [
        (i, int(rng.integers(0, 80)), int(rng.integers(0, 10**6)),
         float(rng.random()), "t")
        for i in range(n)
    ]
    frames = [_events_frames(rows[i::5]) for i in range(5)]
    sf = _write_parts(tmp_path, "events", frames)
    got = (
        latest_event_per_user(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "value", "event_type"])
    want = (
        df.sort_values(["user_id", "ts_us", "event_id"])
        .groupby("user_id", as_index=False)
        .last()[["user_id", "event_id", "ts_us", "event_type", "value"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------- distributed anti-join


def _customer_frames(rows):
    df = pd.DataFrame(rows, columns=["c_custkey", "c_name"])
    df["c_custkey"] = df["c_custkey"].astype("int64")
    return df


def _orders_frames(rows):
    df = pd.DataFrame(rows, columns=["o_custkey", "o_orderpriority"])
    df["o_custkey"] = df["o_custkey"].astype("int64")
    return df


def test_customers_no_orders_planted(ray_session, tmp_path):
    # keys 1..6; urgent orders exist for 2 and 5 (5's in another file);
    # 3 has only a LOW order (must NOT count); 1, 4, 6 have none.
    _write_parts(
        tmp_path, "customer",
        [
            _customer_frames([(1, "a"), (2, "b"), (3, "c")]),
            _customer_frames([(4, "d"), (5, "e"), (6, "f")]),
        ],
    )
    sf = _write_parts(
        tmp_path, "orders",
        [
            _orders_frames([(2, "1-URGENT"), (3, "5-LOW")]),
            _orders_frames([(5, "1-URGENT"), (5, "1-URGENT")]),
        ],
    )
    got = (
        customers_no_orders(sf)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"c_custkey": pd.array([1, 3, 4, 6], "int64"),
         "c_name": ["a", "c", "d", "f"]}
    )
    pd.testing.assert_frame_equal(got, want.astype({"c_custkey": "int64"}))


def test_customers_no_orders_all_and_none(ray_session, tmp_path):
    # every customer has an urgent order → empty result, schema intact
    _write_parts(
        tmp_path, "customer", [_customer_frames([(1, "a"), (2, "b")])]
    )
    sf = _write_parts(
        tmp_path, "orders",
        [_orders_frames([(1, "1-URGENT"), (2, "1-URGENT")])],
    )
    ds = customers_no_orders(sf)
    assert "c_custkey" in ds.schema().names and "c_name" in ds.schema().names
    # all-empty partitions: Ray's to_pandas drops columns, but no rows
    # must leak through
    assert len(ds.to_pandas()) == 0
