"""Edge tests for the round-5 additions: event_deltas (per-user LAG),
exact_quantiles (distributed selection), revenue_rollup (one-pass
ROLLUP), and fuzzy_name_pairs (deletion-neighborhood edit-1 self-join).
Each is checked against an independent brute-force reference over the
same rows; synthetic inputs are written as multi-file parquet
directories so the hash exchanges must really move rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from torchtrajectory_ray.pipelines.events import event_deltas, exact_quantiles
from torchtrajectory_ray.pipelines.analytics import revenue_rollup
from torchtrajectory_ray.pipelines.fuzzyjoin import (
    MAX_BUCKET,
    _deletion_hashes,
    _pad_codes,
    edit1_pairs_mask,
    fuzzy_name_pairs,
)


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
    """rows: (event_id, user_id, t_us, value) tuples → events frames."""
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "t_us", "value"])
    for c in ("event_id", "user_id", "t_us"):
        df[c] = df[c].astype("int64")
    df["value"] = df["value"].astype("float64")
    df["ts"] = pd.to_datetime(df["t_us"], unit="us")
    df["event_type"] = "click"
    df["props"] = "{}"
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


# ---------------------------------------------------------------- LAG


def test_event_deltas_cross_block_ties_and_singletons(ray_session, tmp_path):
    # user 1 split across two files (exchange must co-locate); two rows
    # share ts=100 (order pinned by event_id); user 3 has one event
    # (emits nothing); user 2 interleaved.
    f1 = _events_frames(
        [(1, 1, 100, 0.0), (4, 2, 50, 0.0), (6, 3, 10, 0.0)]
    )
    f2 = _events_frames(
        [(2, 1, 100, 0.0), (3, 1, 250, 0.0), (5, 2, 75, 0.0)]
    )
    sf = _write_parts(tmp_path, "events", [f1, f2])
    got = (
        event_deltas(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            # event 2 follows event 1 at the SAME ts (gap 0, event_id
            # breaks the tie); 3 follows 2; 5 follows 4; 6 drops.
            "event_id": [2, 3, 5],
            "user_id": [1, 1, 2],
            "gap_us": [0, 150, 25],
        }
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_event_deltas_matches_pandas_lag(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 60, n).astype(np.int64),
            "t_us": rng.integers(0, 10**9, n).astype(np.int64),
            "value": rng.random(n),
        }
    )
    frames = [
        _events_frames(list(map(tuple, part[["event_id", "user_id", "t_us", "value"]].to_numpy())))
        for _, part in df.groupby(df.index % 5)
    ]
    sf = _write_parts(tmp_path, "events", frames)
    got = (
        event_deltas(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    s = df.sort_values(["user_id", "t_us", "event_id"])
    lag = s.groupby("user_id")["t_us"].shift(1)
    m = lag.notna()
    want = (
        pd.DataFrame(
            {
                "event_id": s["event_id"][m],
                "user_id": s["user_id"][m],
                "gap_us": (s["t_us"][m] - lag[m]).astype("int64"),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------- distributed selection


def _q_ref(values, qs):
    v = np.sort(np.asarray(values, np.float64))
    n = len(v)
    return [float(v[max(1, int(np.ceil(q * n))) - 1]) for q in qs]


def _events_value_only(tmp_path, values, parts=4):
    chunks = np.array_split(np.asarray(values, np.float64), parts)
    frames = []
    eid = 0
    for c in chunks:
        frames.append(
            _events_frames(
                [(eid + i, 0, i, float(x)) for i, x in enumerate(c)]
            )
        )
        eid += len(c)
    return _write_parts(tmp_path, "events", frames)


def test_exact_quantiles_forced_descent_and_pull(ray_session, tmp_path):
    # tiny bins/local_max force multiple histogram passes AND the
    # bounded pull path; heavy skew puts most mass in one bin
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.random(5000), rng.random(50) * 1e6, [0.5] * 2000]
    )
    sf = _events_value_only(tmp_path, vals)
    qs = (0.1, 0.25, 0.5, 0.9, 0.999)
    got = exact_quantiles(sf, qs, bins=4, local_max=64)
    assert got["value"].tolist() == _q_ref(vals, qs)
    assert got["q"].tolist() == list(qs)


def test_exact_quantiles_duplicate_heavy_fp_collapse(ray_session, tmp_path):
    # a column with ONE dominant value: the bracket collapses below
    # float spacing and must resolve via the distinct-value pass
    vals = np.concatenate([np.full(9000, 3.7), [1.0, 2.0, 5.0, 6.0]])
    sf = _events_value_only(tmp_path, vals, parts=3)
    qs = (0.25, 0.5, 0.75)
    got = exact_quantiles(sf, qs, bins=4, local_max=2)
    assert got["value"].tolist() == _q_ref(vals, qs) == [3.7, 3.7, 3.7]


def test_exact_quantiles_extremes_and_negatives(ray_session, tmp_path):
    vals = np.array([-1e9, -5.0, -5.0, 0.0, 1e-12, 17.0, 1e9])
    sf = _events_value_only(tmp_path, vals, parts=2)
    qs = (0.0001, 0.5, 1.0)
    got = exact_quantiles(sf, qs, bins=8, local_max=2)
    assert got["value"].tolist() == _q_ref(vals, qs)


# ------------------------------------------------------------- ROLLUP


def test_revenue_rollup_levels_consistent(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n),
            "o_orderstatus": rng.choice(["F", "O", "P"], n),
            "o_totalprice": np.round(rng.random(n) * 1000, 2),
        }
    )
    sf = _write_parts(
        tmp_path, "orders", [p for _, p in df.groupby(df.index % 4)]
    )
    got = revenue_rollup(sf)
    fine = got[
        (got.o_orderpriority != "ALL") & (got.o_orderstatus != "ALL")
    ]
    ref = (
        df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False)
        .agg(sum_price=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
        .sort_values(["o_orderpriority", "o_orderstatus"])
        .reset_index(drop=True)
    )
    ref["sum_price"] = ref["sum_price"].round(2)
    pd.testing.assert_frame_equal(
        fine.reset_index(drop=True),
        ref[["o_orderpriority", "o_orderstatus", "sum_price", "n_orders"]],
        check_dtype=False,
    )
    # subtotal and grand-total levels reconcile with the finest level
    mid = got[(got.o_orderpriority != "ALL") & (got.o_orderstatus == "ALL")]
    assert mid["n_orders"].sum() == n
    top = got[(got.o_orderpriority == "ALL")]
    assert len(top) == 1 and int(top["n_orders"].iloc[0]) == n
    assert abs(float(top["sum_price"].iloc[0]) - df["o_totalprice"].sum()) < 0.01


# ----------------------------------------------------- fuzzy self-join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _fuzzy_ref(names: dict[int, str]) -> set[tuple[int, int]]:
    ids = sorted(names)
    return {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _lev(names[a], names[b]) <= 1
    }


def test_edit1_pairs_mask_matches_dp():
    rng = np.random.default_rng(5)
    alphabet = list("abc")
    strs = [
        "".join(rng.choice(alphabet, rng.integers(0, 6)))
        for _ in range(60)
    ] + ["", "a", "ab", "ab", "ba", "abc", "abcd", "bbcd", "acd", "ábç", "abç"]
    na, nb = [], []
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            na.append(strs[i])
            nb.append(strs[j])
    na = np.asarray(na, object)
    nb = np.asarray(nb, object)
    got = edit1_pairs_mask(na, nb)
    want = np.array([_lev(a, b) <= 1 for a, b in zip(na, nb)])
    assert (got == want).all()


def test_deletion_hashes_equal_materialized_variants():
    names = np.asarray(["abcde", "xyzzy", "héllo", "aaaaa"], object)
    full, dels = _deletion_hashes(_pad_codes(names, 5))
    for r, s in enumerate(names):
        for i in range(5):
            var = s[:i] + s[i + 1 :]
            codes = _pad_codes(np.asarray([var], object), 4)
            f, _ = _deletion_hashes(codes)
            assert dels[r, i] == f[0], (s, i)
        f, _ = _deletion_hashes(_pad_codes(np.asarray([s], object), 5))
        assert full[r] == f[0]


def test_fuzzy_name_pairs_planted_cross_block(ray_session, tmp_path):
    names = {
        1: "martha",
        2: "marta",     # deletion of 1
        3: "martha",    # identical to 1
        4: "marsha",    # substitution of 1
        5: "maratha",   # insertion into 1
        6: "marthaxx",  # distance 2 from 1
        7: "",
        8: "x",         # 7↔8 distance 1
        9: "",          # 7↔9 identical (distance 0)
        10: "mxrta",    # substitution of 2; distance 2 from 1
    }
    ids = sorted(names)
    df = pd.DataFrame(
        {"c_custkey": np.array(ids, np.int64), "c_name": [names[i] for i in ids]}
    )
    sf = _write_parts(
        tmp_path, "customer", [df.iloc[::2], df.iloc[1::2]]
    )
    got = fuzzy_name_pairs(sf).to_pandas()
    got_pairs = set(zip(got["custkey_a"].tolist(), got["custkey_b"].tolist()))
    assert got_pairs == _fuzzy_ref(names)
    assert len(got) == len(got_pairs)  # no duplicate pair rows


def test_fuzzy_name_pairs_random_matches_dp(ray_session, tmp_path):
    rng = np.random.default_rng(13)
    alphabet = list("ab")
    names = {
        i: "".join(rng.choice(alphabet, rng.integers(1, 5)))
        for i in range(1, 81)
    }
    df = pd.DataFrame(
        {
            "c_custkey": np.array(sorted(names), np.int64),
            "c_name": [names[i] for i in sorted(names)],
        }
    )
    sf = _write_parts(tmp_path, "customer", [df.iloc[:40], df.iloc[40:]])
    got = fuzzy_name_pairs(sf).to_pandas()
    got_pairs = set(zip(got["custkey_a"].tolist(), got["custkey_b"].tolist()))
    assert got_pairs == _fuzzy_ref(names)


def test_fuzzy_bucket_bound_fails_loud(ray_session, tmp_path):
    n = MAX_BUCKET + 2
    df = pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_name": ["same"] * n,
        }
    )
    sf = _write_parts(tmp_path, "customer", [df])
    with pytest.raises(Exception, match="MAX_BUCKET"):
        fuzzy_name_pairs(sf).materialize()
