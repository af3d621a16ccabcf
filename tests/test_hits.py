"""HITS hubs/authorities (pipelines/graph.py): identity vs an
in-memory numpy recompute on the same derived bipartite graph, L1
normalization invariants, and the parity/kind correspondence.  The
sf0.01 oracle gate (`hits`) runs in test_driver_gate.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from torchtrajectory_ray.pipelines.graph import purchase_hits

SF = "/root/testdata/sf0.001"


def _pairs(sf_dir: str) -> pd.DataFrame:
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    lines = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    m = orders.merge(lines, left_on="o_orderkey", right_on="l_orderkey")
    return (
        pd.DataFrame(
            {
                "c": m["o_custkey"].to_numpy().astype(np.int64) * 2,
                "s": m["l_suppkey"].to_numpy().astype(np.int64) * 2 + 1,
            }
        )
        .drop_duplicates()
        .reset_index(drop=True)
    )


def _reference(sf_dir: str, iters: int = 2) -> pd.DataFrame:
    pairs = _pairs(sf_dir)
    custs = np.unique(pairs["c"].to_numpy())
    supps = np.unique(pairs["s"].to_numpy())
    ci = {n: i for i, n in enumerate(custs)}
    si = {n: i for i, n in enumerate(supps)}
    ei = np.fromiter((ci[x] for x in pairs["c"]), np.int64, len(pairs))
    ej = np.fromiter((si[x] for x in pairs["s"]), np.int64, len(pairs))
    h = np.ones(len(custs))
    for _ in range(iters):
        a = np.zeros(len(supps))
        np.add.at(a, ej, h[ei])
        a /= a.sum()
        h = np.zeros(len(custs))
        np.add.at(h, ei, a[ej])
        h /= h.sum()
    return pd.concat(
        [
            pd.DataFrame({"node": supps, "kind": "auth", "score": np.round(a, 6)}),
            pd.DataFrame({"node": custs, "kind": "hub", "score": np.round(h, 6)}),
        ],
        ignore_index=True,
    )


def test_hits_matches_numpy(ray_session):
    got = purchase_hits(SF)
    ref = _reference(SF)
    assert got["node"].tolist() == ref["node"].tolist()
    assert got["kind"].tolist() == ref["kind"].tolist()
    assert np.allclose(
        got["score"].to_numpy(), ref["score"].to_numpy(), rtol=0, atol=2e-6
    )


def test_hits_invariants(ray_session):
    got = purchase_hits(SF)
    # L1 normalization: each side sums to 1 up to per-row rounding
    for kind in ("auth", "hub"):
        g = got[got["kind"] == kind]
        assert abs(g["score"].sum() - 1.0) < 5e-7 * len(g) + 1e-9
        assert (g["score"] > 0).all()
    # parity ↔ kind: authorities are suppliers (odd), hubs customers (even)
    assert (got.loc[got["kind"] == "auth", "node"] % 2 == 1).all()
    assert (got.loc[got["kind"] == "hub", "node"] % 2 == 0).all()


def test_hits_iteration_count_changes_result(ray_session):
    r1 = purchase_hits(SF, iters=1)
    r2 = purchase_hits(SF, iters=2)
    assert r1["node"].tolist() == r2["node"].tolist()
    assert not np.allclose(r1["score"].to_numpy(), r2["score"].to_numpy())
    ref1 = _reference(SF, iters=1)
    assert np.allclose(
        r1["score"].to_numpy(), ref1["score"].to_numpy(), rtol=0, atol=2e-6
    )
