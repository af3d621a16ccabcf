"""Edge tests for the third continuation batch: grouped rank selection
(select_ranks_by_group / exact_median_by_type), the user×event-type
PIVOT, and the preserved-side LEFT-join aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture
def force_descent(monkeypatch):
    """Pin the rank selectors to the distributed histogram descent
    (disable the size-aware single-task fast path) so these tests keep
    exercising the 100-TB path on small synthetic inputs."""
    from torchtrajectory_ray.functions import rankselect

    monkeypatch.setattr(rankselect, "LOCAL_SELECT_MAX_ROWS", 0)


def _write_parts(tmp_path, name, frames):
    d = tmp_path / f"{name}.parquet"
    d.mkdir()
    for i, df in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    return str(tmp_path)


def _events_df(types, values, uid0=0):
    n = len(values)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.arange(uid0, uid0 + n, dtype=np.int64) % 7,
            "event_type": types,
            "value": np.asarray(values, np.float64),
            "props": "{}",
        }
    )


def test_grouped_select_matches_per_group_sort(ray_session, tmp_path, force_descent):
    from torchtrajectory_ray.functions.rankselect import select_ranks_by_group

    rng = np.random.default_rng(5)
    types = rng.choice(["a", "b", "c"], size=900)
    vals = rng.normal(size=900) * 10
    df = _events_df(types, vals)
    root = _write_parts(
        tmp_path, "events", [x.copy() for x in np.array_split(df, 4)]
    )

    import ray.data

    def make():
        return ray.data.read_parquet(
            f"{root}/events.parquet", columns=["event_type", "value"]
        )

    ranks_of = {}
    for g in ["a", "b", "c"]:
        n_g = int((types == g).sum())
        ranks_of[g] = [1, n_g // 2, n_g]
    got = select_ranks_by_group(
        make, "value", "event_type", ranks_of, bins=8, local_max=16
    )
    for g, rs in ranks_of.items():
        sv = np.sort(vals[types == g])
        for r in rs:
            assert got[g][r] == sv[r - 1], (g, r)


def test_grouped_select_rank_out_of_range(ray_session, tmp_path):
    from torchtrajectory_ray.functions.rankselect import select_ranks_by_group

    df = _events_df(["a"] * 5, [1.0, 2.0, 3.0, 4.0, 5.0])
    root = _write_parts(tmp_path, "events", [df])

    import ray.data

    def make():
        return ray.data.read_parquet(
            f"{root}/events.parquet", columns=["event_type", "value"]
        )

    with pytest.raises(ValueError, match="out of"):
        select_ranks_by_group(make, "value", "event_type", {"a": [6]})


def test_exact_median_by_type_matches_numpy(ray_session):
    from torchtrajectory_ray.pipelines.events import exact_median_by_type

    got = exact_median_by_type(SF_SMALL).set_index("event_type")["median_value"]
    df = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    for g, grp in df.groupby("event_type"):
        exp = round(float(np.quantile(grp["value"], 0.5, method="linear")), 6)
        assert got[g] == exp, g


def test_user_event_pivot_cross_block(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.events import user_event_pivot

    # user 1's events split across files; user 2 has only one type;
    # one file has NO 'error' events at all (missing-column fill path)
    f1 = _events_df(["click", "view", "click"], [1.0, 2.0, 3.0])
    f1["user_id"] = np.array([1, 1, 2], np.int64)
    f2 = _events_df(["view", "error", "purchase"], [4.0, 5.0, 6.0])
    f2["user_id"] = np.array([1, 1, 1], np.int64)
    root = _write_parts(tmp_path, "events", [f1, f2])
    got = (
        user_event_pivot(root)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "user_id": np.array([1, 2], np.int64),
            "n_click": np.array([1, 1], np.int64),
            "n_error": np.array([1, 0], np.int64),
            "n_purchase": np.array([1, 0], np.int64),
            "n_signup": np.array([0, 0], np.int64),
            "n_view": np.array([2, 0], np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, exp)


def test_customer_order_counts_preserves_zero_customers(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.analytics import customer_order_counts

    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], np.int64),
            "c_name": ["C1", "C2", "C3"],
            "c_nationkey": np.array([0, 0, 0], np.int32),
            "c_acctbal": [0.0, 0.0, 0.0],
            "c_mktsegment": "BUILDING",
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([10, 11, 12, 13], np.int64),
            "o_custkey": np.array([1, 1, 2, 1], np.int64),
            "o_orderstatus": ["O", "O", "F", "O"],  # C2's only order is F
            "o_totalprice": [10.0, 20.0, 99.0, 30.0],
            "o_orderdate": pd.Timestamp("2000-01-01"),
            "o_orderpriority": "1-URGENT",
        }
    )
    _write_parts(tmp_path, "customer", [cust.iloc[:2], cust.iloc[2:]])
    root = _write_parts(tmp_path, "orders", [orders.iloc[:2], orders.iloc[2:]])
    got = (
        customer_order_counts(root)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], np.int64),
            "c_name": ["C1", "C2", "C3"],
            "n_orders": np.array([3, 0, 0], np.int64),
            "total_price": [60.0, 0.0, 0.0],
        }
    )
    pd.testing.assert_frame_equal(got, exp)


def test_robust_stats_fused_fast_path_matches_descent(ray_session, monkeypatch):
    """The fused single-task (median, MAD) kernel returns frame-identical
    results to the five-pass chained grouped selections, and
    exact_quantiles' fast path matches its histogram descent."""
    from torchtrajectory_ray.functions import rankselect
    from torchtrajectory_ray.pipelines import events

    events.clear_robust_stats_cache()
    fast = events.value_mad_by_type(SF_SMALL)
    fast_q = events.exact_quantiles(SF_SMALL)

    events.clear_robust_stats_cache()
    monkeypatch.setattr(rankselect, "LOCAL_SELECT_MAX_ROWS", 0)
    pd.testing.assert_frame_equal(events.value_mad_by_type(SF_SMALL), fast)
    pd.testing.assert_frame_equal(events.exact_quantiles(SF_SMALL), fast_q)
    events.clear_robust_stats_cache()


def test_value_mad_fused_fast_path_matches_descent(ray_session, monkeypatch):
    from torchtrajectory_ray.functions import rankselect
    from torchtrajectory_ray.pipelines import events

    fast = events.value_mad(SF_SMALL)
    monkeypatch.setattr(rankselect, "LOCAL_SELECT_MAX_ROWS", 0)
    pd.testing.assert_frame_equal(events.value_mad(SF_SMALL), fast)
