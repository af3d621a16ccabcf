"""PageRank supersteps (pipelines/graph.py): identity vs an in-memory
numpy power iteration on the same derived graph, mass conservation, and
the exchange's partition invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from torchtrajectory_ray.pipelines.graph import (
    DAMPING,
    _part_of,
    purchase_pagerank,
)

SF = "/root/testdata/sf0.001"


def _reference(sf_dir: str, iters: int = 3, d: float = DAMPING) -> pd.DataFrame:
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    lines = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    m = orders.merge(lines, left_on="o_orderkey", right_on="l_orderkey")
    pairs = (
        pd.DataFrame(
            {
                "c": m["o_custkey"].to_numpy().astype(np.int64) * 2,
                "s": m["l_suppkey"].to_numpy().astype(np.int64) * 2 + 1,
            }
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )
    src = np.concatenate([pairs["c"].to_numpy(), pairs["s"].to_numpy()])
    dst = np.concatenate([pairs["s"].to_numpy(), pairs["c"].to_numpy()])
    nodes = np.unique(src)
    idx = {n: i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[x] for x in src), np.int64, len(src))
    di = np.fromiter((idx[x] for x in dst), np.int64, len(dst))
    od = np.bincount(si, minlength=len(nodes)).astype(np.float64)
    n = float(len(nodes))
    r = np.full(len(nodes), 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(len(nodes))
        np.add.at(contrib, di, r[si] / od[si])
        r = (1.0 - d) / n + d * contrib
    return pd.DataFrame({"node": nodes, "pr": np.round(r, 6)})


def test_pagerank_matches_numpy_power_iteration(ray_session):
    got = purchase_pagerank(SF)
    ref = _reference(SF)
    assert got["node"].tolist() == ref["node"].tolist()
    assert np.allclose(
        got["pr"].to_numpy(), ref["pr"].to_numpy(), rtol=0, atol=2e-6
    )


def test_pagerank_mass_conservation(ray_session):
    got = purchase_pagerank(SF)
    # symmetric edges: no dangling mass, so Σ pr == 1 up to the 6-dp
    # rounding of each row (n_nodes · 5e-7 worst case)
    assert abs(got["pr"].sum() - 1.0) < 5e-7 * len(got) + 1e-9
    assert (got["pr"] > 0).all()
    # parity split: both customer (even) and supplier (odd) nodes exist
    parity = got["node"].to_numpy() % 2
    assert (parity == 0).any() and (parity == 1).any()


def test_pagerank_iteration_count_changes_result(ray_session):
    r1 = purchase_pagerank(SF, iters=1)
    r3 = purchase_pagerank(SF, iters=3)
    assert r1["node"].tolist() == r3["node"].tolist()
    assert not np.allclose(r1["pr"].to_numpy(), r3["pr"].to_numpy())
    # iters=1 must equal the reference at 1 iteration too
    ref1 = _reference(SF, iters=1)
    assert np.allclose(
        r1["pr"].to_numpy(), ref1["pr"].to_numpy(), rtol=0, atol=2e-6
    )


def test_part_of_is_total_and_bounded():
    keys = np.arange(-5, 100000, 37, dtype=np.int64)
    parts = _part_of(keys)
    assert parts.dtype == np.int32
    assert parts.min() >= 0 and parts.max() < 256
