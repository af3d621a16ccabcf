"""BFS hop distances and co-purchase wedge top-k (pipelines/graph.py):
identity vs in-memory recomputes on the same derived graph, frontier
and fail-loud invariants.  The sf0.01 oracle gates (`graph_bfs`,
`copurchase_topk`) run in test_driver_gate.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from torchtrajectory_ray.pipelines.graph import (
    BFS_SEED_CUSTKEYS,
    copurchase_topk,
    purchase_bfs,
)

SF = "/root/testdata/sf0.001"


def _pairs(sf_dir: str) -> pd.DataFrame:
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    lines = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    m = orders.merge(lines, left_on="o_orderkey", right_on="l_orderkey")
    return pd.DataFrame(
        {
            "c": m["o_custkey"].to_numpy().astype(np.int64),
            "s": m["l_suppkey"].to_numpy().astype(np.int64),
        }
    ).drop_duplicates()


def _bfs_reference(sf_dir: str, hops: int) -> pd.DataFrame:
    pairs = _pairs(sf_dir)
    src = np.concatenate([pairs["c"] * 2, pairs["s"] * 2 + 1])
    dst = np.concatenate([pairs["s"] * 2 + 1, pairs["c"] * 2])
    dist = {int(c) * 2: 0 for c in BFS_SEED_CUSTKEYS}
    adj: dict[int, list[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, []).append(v)
    for _ in range(hops):
        nxt = dict(dist)
        for u, du in dist.items():
            for v in adj.get(u, []):
                if du + 1 < nxt.get(v, 1 << 30):
                    nxt[v] = du + 1
        dist = nxt
    return (
        pd.DataFrame(
            {"node": sorted(dist), "dist": [dist[n] for n in sorted(dist)]}
        ).astype(np.int64)
    )


def test_bfs_matches_reference(ray_session):
    got = purchase_bfs(SF)
    ref = _bfs_reference(SF, hops=3)
    pd.testing.assert_frame_equal(got, ref)


def test_bfs_frontier_properties(ray_session):
    got = purchase_bfs(SF, hops=1)
    # seeds at distance 0; everything else in the 1-hop table is 1
    seeds = {c * 2 for c in BFS_SEED_CUSTKEYS}
    assert set(got.loc[got["dist"] == 0, "node"]) == seeds
    assert got["dist"].max() <= 1
    # monotone expansion: deeper horizon only adds nodes / keeps dists
    g3 = purchase_bfs(SF, hops=3)
    m = got.merge(g3, on="node", suffixes=("_1", "_3"))
    assert (m["dist_1"] == m["dist_3"]).all()
    assert len(g3) >= len(got)


def test_copurchase_matches_bruteforce(ray_session):
    got = copurchase_topk(SF, k=25)
    pairs = _pairs(SF)
    m = pairs.merge(pairs, on="s")
    m = m[m["c_x"] < m["c_y"]]
    bf = (
        m.groupby(["c_x", "c_y"], as_index=False)
        .size()
        .rename(columns={"c_x": "cust_a", "c_y": "cust_b", "size": "shared"})
    )
    bf = bf[bf["shared"] >= 2].sort_values(
        ["shared", "cust_a", "cust_b"], ascending=[False, True, True],
        kind="mergesort",
    ).head(25).reset_index(drop=True).astype(np.int64)
    pd.testing.assert_frame_equal(got, bf)


def test_copurchase_fanout_fail_loud(ray_session):
    with pytest.raises(Exception, match="max_fanout"):
        copurchase_topk(SF, max_fanout=2)


def _ppr_reference(sf_dir: str, iters: int = 3, d: float = 0.85) -> pd.DataFrame:
    pairs = _pairs(sf_dir)
    c = pairs["c"].to_numpy() * 2
    s = pairs["s"].to_numpy() * 2 + 1
    src = np.concatenate([c, s])
    dst = np.concatenate([s, c])
    nodes = np.unique(np.concatenate([src, [c * 2 for c in BFS_SEED_CUSTKEYS]]))
    idx = {n: i for i, n in enumerate(nodes)}
    si = np.fromiter((idx[x] for x in src), np.int64, len(src))
    di = np.fromiter((idx[x] for x in dst), np.int64, len(dst))
    od = np.bincount(si, minlength=len(nodes)).astype(np.float64)
    seed_idx = np.asarray([idx[c * 2] for c in BFS_SEED_CUSTKEYS])
    t = np.zeros(len(nodes))
    t[seed_idx] = 1.0 / len(seed_idx)
    r = t.copy()
    for _ in range(iters):
        contrib = np.zeros(len(nodes))
        np.add.at(contrib, di, r[si] / od[si])
        r = (1.0 - d) * t + d * contrib
    keep = r > 0
    return pd.DataFrame(
        {"node": nodes[keep], "ppr": np.round(r[keep], 6)}
    ).astype({"node": np.int64})


def test_personalized_pagerank_matches_numpy(ray_session):
    from torchtrajectory_ray.pipelines.graph import personalized_pagerank

    got = personalized_pagerank(SF)
    ref = _ppr_reference(SF)
    assert got["node"].tolist() == ref["node"].tolist()
    assert np.allclose(
        got["ppr"].to_numpy(), ref["ppr"].to_numpy(), rtol=0, atol=2e-6
    )
    # seeds hold restart mass; total mass ≤ 1 (walk still spreading)
    seeds = {c * 2 for c in BFS_SEED_CUSTKEYS}
    assert seeds <= set(got["node"])
    assert got["ppr"].sum() <= 1.0 + 5e-7 * len(got)
    # locality: after k rounds mass lives within k hops of the seeds
    reach = purchase_bfs(SF, hops=3)
    assert set(got["node"]) <= set(reach["node"])


def test_graph_local_fast_path_matches_distributed(ray_session, monkeypatch):
    """The single-task numpy fast path (LOCAL_GRAPH_MAX_ROWS dispatch)
    returns frame-identical results to the Pregel exchange rounds for
    all four iterative ops — the connected-components identity pattern."""
    from torchtrajectory_ray.pipelines import graph

    fns = [
        graph.purchase_pagerank,
        graph.purchase_hits,
        graph.purchase_bfs,
        graph.personalized_pagerank,
    ]
    local = [fn(SF) for fn in fns]
    monkeypatch.setattr(graph, "LOCAL_GRAPH_MAX_ROWS", 0)
    for fn, want in zip(fns, local):
        pd.testing.assert_frame_equal(fn(SF), want)
