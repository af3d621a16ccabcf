"""SQ8 quantized IVF probe: int8 codes stored next to the floats, scan
over the small column, margin-bounded exact rescore.

The claim under test is strict: probe_topk_sq8 is RANK-IDENTICAL to
probe_topk at the same probe set (the margin 2·sqrt(dim)/254 provably
retains every true top-k candidate), and the scan pays ~4× fewer
compressed bytes than the float column over the same probed buckets."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from torchtrajectory_ray.pipelines import ivf

from test_round3_ivf import _clustered, _write_emb


def _build(tmp_path, n=600, name="e", **kw):
    src = _write_emb(str(tmp_path / f"{name}.parquet"), _clustered(n))
    d = str(tmp_path / f"ivf_{name}")
    meta = ivf.build_ivf(
        [src], d, id_col="vec_id", nlist=None, target_bucket_rows=50, **kw
    )
    return src, d, meta


def _queries(src, qids):
    import pyarrow.parquet as pq

    t = pq.read_table(src, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    pos = {int(v): i for i, v in enumerate(ids)}
    return np.asarray(
        [t["embedding"][pos[q]].as_py() for q in qids], np.float64
    )


def test_sq8_error_bound_holds():
    """|q·x̂ − q·x| ≤ sqrt(dim)/254 for unit q, x — the margin's premise."""
    rng = np.random.default_rng(3)
    for dim in (8, 64, 256):
        x = rng.normal(size=(200, dim))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = rng.normal(size=(16, dim))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        deq = np.rint(x * 127.0).astype(np.int8).astype(np.float64) / 127.0
        err = np.abs(q @ deq.T - q @ x.T)
        assert err.max() <= ivf._sq8_error_bound(dim) + 1e-12


@pytest.mark.parametrize("nprobe", [2, 10**9])
def test_sq8_probe_rank_identical_to_float_probe(ray_session, tmp_path, nprobe):
    src, d, _ = _build(tmp_path)
    qids = [0, 3, 17, 41]
    q = _queries(src, qids)
    want, _ = ivf.probe_topk(d, qids, q, k=10, nprobe=nprobe)
    got, stats = ivf.probe_topk_sq8(d, qids, q, k=10, nprobe=nprobe)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert stats["n_candidates"] >= 10 * len(qids)


def test_sq8_scan_bytes_smaller_than_float(ray_session, tmp_path):
    src, d, _ = _build(tmp_path)
    qids = [0, 1]
    q = _queries(src, qids)
    _, stats = ivf.probe_topk_sq8(d, qids, q, k=5, nprobe=2)
    assert 0 < stats["sq8_bytes_read"] < stats["float_bytes_probed"]
    # float32 lists vs int8 lists: expect a real gap, not a rounding win
    assert stats["sq8_bytes_read"] < 0.5 * stats["float_bytes_probed"]


def test_sq8_exact_over_extended_layout(ray_session, tmp_path):
    """extend_ivf writes codes into the appended parts too — quantized
    full probe over gen0+gen1 equals the float full probe."""
    src0, d, _ = _build(tmp_path, n=300, name="g0")
    qids = [2, 5]
    q = _queries(src0, qids)
    # gen1 carries near-copies of the query vectors, so gen1 ids are
    # guaranteed inside the exact top-k (not a seed-dependent accident)
    rng = np.random.default_rng(11)
    vec1 = np.vstack(
        [q + 1e-3 * rng.normal(size=q.shape), _clustered(198, seed=11)]
    )
    src1 = _write_emb(
        str(tmp_path / "g1.parquet"),
        vec1,
        ids=np.arange(1000, 1200, dtype=np.int64),
    )
    ivf.extend_ivf([src1], d)
    want, _ = ivf.probe_topk(d, qids, q, k=8, nprobe=10**9)
    got, _ = ivf.probe_topk_sq8(d, qids, q, k=8, nprobe=10**9)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert set(got["neighbor_id"]) & set(range(1000, 1200))  # gen1 reachable


def test_sq8_max_candidates_fails_loud(ray_session, tmp_path):
    src, d, _ = _build(tmp_path, n=200, name="cap")
    q = _queries(src, [0])
    with pytest.raises(ValueError, match="max_candidates"):
        ivf.probe_topk_sq8(d, [0], q, k=10, nprobe=10**9, max_candidates=3)


def test_pre_sq8_layout_fails_loud(ray_session, tmp_path):
    src, d, _ = _build(tmp_path, n=120, name="old")
    meta_path = os.path.join(d, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["params"].pop("sq8")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    q = _queries(src, [0])
    with pytest.raises(ValueError, match="sq8"):
        ivf.probe_topk_sq8(d, [0], q, k=5, nprobe=1)
    with pytest.raises(ValueError, match="sq8"):
        ivf.extend_ivf([src], d)
