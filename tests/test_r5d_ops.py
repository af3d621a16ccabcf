"""Edge tests for the second continuation batch: value_mad (chained
rank selections over a derived stream), nation_suppliers (ordered
string aggregation), revenue_cube (one-pass grouping sets), and
length_weighted_sample (deterministic weighted Bernoulli coins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_SMALL = "/root/testdata/sf0.001"


def _write_parts(tmp_path, name, frames):
    d = tmp_path / f"{name}.parquet"
    d.mkdir()
    for i, df in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    return str(tmp_path)


def _events_df(values):
    n = len(values)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": "view",
            "value": np.asarray(values, np.float64),
            "props": "{}",
        }
    )


def test_value_mad_even_n_interpolates(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.events import value_mad

    v = np.array([1.0, 2.0, 4.0, 8.0])
    root = _write_parts(tmp_path, "events", [_events_df(v[:2]), _events_df(v[2:])])
    got = value_mad(root).set_index("stat")["value"]
    # median = (2+4)/2 = 3; deviations {2,1,1,5} → mad = (1+2)/2 = 1.5
    assert got["median"] == 3.0
    assert got["mad"] == 1.5


def test_value_mad_matches_numpy(ray_session):
    from torchtrajectory_ray.pipelines.events import value_mad

    got = value_mad(SF_SMALL).set_index("stat")["value"]
    v = pq.read_table(
        f"{SF_SMALL}/events.parquet", columns=["value"]
    )["value"].to_numpy()
    med = float(np.quantile(v, 0.5, method="linear"))
    mad = float(np.quantile(np.abs(v - med), 0.5, method="linear"))
    assert got["median"] == round(med, 6)
    assert got["mad"] == round(mad, 6)


def test_nation_suppliers_cross_block_order(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.analytics import nation_suppliers

    # names deliberately OUT of order across files: the global sorted
    # concatenation must interleave them
    s1 = pd.DataFrame(
        {"s_suppkey": np.array([1, 2], np.int64),
         "s_name": ["S_c", "S_a"],
         "s_nationkey": np.array([0, 0], np.int32),
         "s_acctbal": [1.0, 2.0]}
    )
    s2 = pd.DataFrame(
        {"s_suppkey": np.array([3, 4], np.int64),
         "s_name": ["S_b", "S_z"],
         "s_nationkey": np.array([0, 1], np.int32),
         "s_acctbal": [3.0, 4.0]}
    )
    nat = pd.DataFrame(
        {"n_nationkey": np.array([0, 1], np.int32),
         "n_name": ["N_A", "N_B"],
         "n_regionkey": np.array([0, 0], np.int32)}
    )
    root = _write_parts(tmp_path, "supplier", [s1, s2])
    pq.write_table(
        pa.Table.from_pandas(nat, preserve_index=False),
        str(tmp_path / "nation.parquet"),
    )
    got = nation_suppliers(root)
    exp = pd.DataFrame(
        {"n_name": ["N_A", "N_B"],
         "n_suppliers": np.array([3, 1], np.int64),
         "supplier_names": ["S_a,S_b,S_c", "S_z"]}
    )
    pd.testing.assert_frame_equal(got, exp)


def test_revenue_cube_level_consistency(ray_session):
    from torchtrajectory_ray.pipelines.analytics import revenue_cube

    out = revenue_cube(SF_SMALL)
    fine = out[(out["o_orderpriority"] != "ALL") & (out["o_orderstatus"] != "ALL")]
    by_p = out[(out["o_orderpriority"] != "ALL") & (out["o_orderstatus"] == "ALL")]
    by_s = out[(out["o_orderpriority"] == "ALL") & (out["o_orderstatus"] != "ALL")]
    top = out[(out["o_orderpriority"] == "ALL") & (out["o_orderstatus"] == "ALL")]
    n = fine["n_orders"].sum()
    assert by_p["n_orders"].sum() == n == by_s["n_orders"].sum()
    assert len(top) == 1 and top["n_orders"].iloc[0] == n
    # every (priority) subtotal equals the sum of its fine rows
    for p, g in fine.groupby("o_orderpriority"):
        row = by_p[by_p["o_orderpriority"] == p]
        assert row["n_orders"].iloc[0] == g["n_orders"].sum()
        assert abs(row["sum_price"].iloc[0] - round(g["sum_price"].sum(), 2)) < 0.02


def test_length_weighted_sample_membership(ray_session):
    """Membership is a pure function of (doc_id, n_chars): replay the
    md5 coins in-process and compare exactly; weight-1 docs are always
    kept."""
    import hashlib
    from torchtrajectory_ray.pipelines.sampling import length_weighted_sample

    got = length_weighted_sample(SF_SMALL).to_pandas()
    docs = pq.read_table(
        f"{SF_SMALL}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    coins = np.array(
        [
            int(hashlib.md5(f"{int(d)}:ws".encode()).hexdigest()[:13], 16)
            for d in docs["doc_id"]
        ],
        np.float64,
    ) / float(1 << 52)
    w = np.minimum(1.0, docs["n_chars"].to_numpy() / 2000.0)
    exp = docs[coins < w]
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    # docs at/above target length are kept unconditionally
    big = docs[docs["n_chars"] >= 2000]["doc_id"]
    assert set(big).issubset(set(got["doc_id"]))
