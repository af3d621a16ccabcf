"""Vector tombstones (delete_vectors / purge_deleted): every IVF probe
path — driver, sq8, Dataset-batch, bucket-pair near-dup — must mask the
set immediately, and the purge must equal a fresh build on the filtered
vectors."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from torchtrajectory_ray.pipelines import ivf

from test_round3_ivf import _clustered, _write_emb
from test_sq8 import _build, _queries


def _probe_all_paths(d, qids, q, k=8, nprobe=10**9):
    """(driver, sq8, dataset-batch) results at full probe, canonical."""
    import pyarrow as pa
    import ray.data

    drv, _ = ivf.probe_topk(d, qids, q, k=k, nprobe=nprobe)
    sq8, _ = ivf.probe_topk_sq8(d, qids, q, k=k, nprobe=nprobe)
    qds = ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in q],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(2)
    ds = (
        ivf.probe_topk_ds(d, qds, k=k, nprobe=nprobe)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return drv.reset_index(drop=True), sq8.reset_index(drop=True), ds


def test_deleted_vectors_vanish_from_every_probe_path(ray_session, tmp_path):
    src, d, _ = _build(tmp_path, n=400, name="vt")
    qids = [0, 5]
    q = _queries(src, qids)
    before, _, _ = _probe_all_paths(d, qids, q)
    victims = sorted(set(before["neighbor_id"].astype(int).tolist()))[:5]
    res = ivf.delete_vectors(d, victims)
    assert res["n_deleted_total"] == 5
    drv, sq8, ds = _probe_all_paths(d, qids, q)
    for out in (drv, sq8, ds):
        assert not set(victims) & set(out["neighbor_id"].astype(int))
        assert (out.groupby("query_id")["rank"].count() == 8).all()
    # all three paths stay rank-identical to each other
    pd.testing.assert_frame_equal(drv, sq8)
    pd.testing.assert_frame_equal(drv, ds[drv.columns])
    # near-dup pairs exclude tombstoned vectors too
    pairs, _ = ivf.neardup_pairs(d, 0.0, max_pairs_per_task=10**9)
    assert not set(victims) & (
        set(pairs["vec_a"].astype(int)) | set(pairs["vec_b"].astype(int))
    )


def test_delete_vectors_edges(ray_session, tmp_path):
    src, d, _ = _build(tmp_path, n=120, name="vte")
    with pytest.raises(ValueError, match="not in this layout"):
        ivf.delete_vectors(d, [10**12])
    with pytest.raises(ValueError, match="empty"):
        ivf.delete_vectors(d, [])
    r1 = ivf.delete_vectors(d, [3, 5])
    r2 = ivf.delete_vectors(d, [3, 5])
    assert r2["n_new"] == 0 and r2["n_deleted_total"] == r1["n_deleted_total"]


def test_purge_equals_fresh_build_on_filtered_vectors(ray_session, tmp_path):
    vecs = _clustered(300)
    src = _write_emb(str(tmp_path / "all.parquet"), vecs)
    d = str(tmp_path / "ivf_all")
    ivf.build_ivf([src], d, id_col="vec_id", nlist=None, target_bucket_rows=50)
    victims = list(range(0, 60, 7))
    ivf.delete_vectors(d, victims)
    stats = ivf.purge_deleted(d)
    assert stats["n_purged"] == len(victims)
    assert not os.path.exists(os.path.join(d, "tombstones.json"))
    # fresh layout over the filtered vectors, SAME centroids not needed:
    # compare via full probe (exact k-NN regardless of bucketing)
    keep = ~np.isin(np.arange(len(vecs)), victims)
    src_f = _write_emb(
        str(tmp_path / "filtered.parquet"),
        vecs[keep],
        ids=np.arange(len(vecs), dtype=np.int64)[keep],
    )
    df = str(tmp_path / "ivf_filtered")
    ivf.build_ivf([src_f], df, id_col="vec_id", nlist=None, target_bucket_rows=50)
    qids = [1, 2]
    q = _queries(src, qids)
    got, _ = ivf.probe_topk(d, qids, q, k=10, nprobe=10**9)
    want, _ = ivf.probe_topk(df, qids, q, k=10, nprobe=10**9)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # meta bookkeeping reflects the purge
    import json

    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert sum(v["n"] for v in meta["buckets"].values()) == int(keep.sum())
    total = sum(
        os.path.getsize(os.path.join(d, p))
        for v in meta["buckets"].values()
        for p in v["paths"]
    )
    assert meta["total_bytes"] == total


def test_purge_without_tombstones_is_noop(ray_session, tmp_path):
    _, d, _ = _build(tmp_path, n=100, name="noop")
    assert ivf.purge_deleted(d) == {"n_purged": 0, "n_buckets_rewritten": 0}


def test_fully_tombstoned_bucket_probes_cleanly(ray_session, tmp_path):
    """Review fix: deleting EVERY vector of some bucket must not crash
    any probe path (0-row batches after the live-mask filter), and a
    purge that empties a bucket leaves a layout later probes can read."""
    import json

    src, d, _ = _build(tmp_path, n=200, name="allgone")
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    # victims = every id of the largest bucket
    import pyarrow.parquet as pq

    b, info = max(meta["buckets"].items(), key=lambda kv: kv[1]["n"])
    ids = pq.read_table(
        [os.path.join(d, p) for p in info["paths"]], columns=["vec_id"]
    )["vec_id"].to_numpy()
    ivf.delete_vectors(d, ids)
    qids = [0, 1]
    q = _queries(src, qids)
    drv, sq8, ds = _probe_all_paths(d, qids, q)
    for out in (drv, sq8, ds):
        assert not set(ids.tolist()) & set(out["neighbor_id"].astype(int))
        assert len(out) > 0
    pd.testing.assert_frame_equal(drv, sq8)
    # near-dup over a layout with one dead bucket
    pairs, _ = ivf.neardup_pairs(d, 0.99, max_pairs_per_task=10**9)
    assert not set(ids.tolist()) & (
        set(pairs["vec_a"].astype(int)) | set(pairs["vec_b"].astype(int))
    )
    # purge empties the bucket physically; probes still fine
    ivf.purge_deleted(d)
    drv2, _, _ = _probe_all_paths(d, qids, q)
    pd.testing.assert_frame_equal(drv, drv2)
    with open(os.path.join(d, "meta.json")) as f:
        meta2 = json.load(f)
    assert meta2["buckets"][b]["n"] == 0
    assert meta2["n_vectors"] == 200 - len(ids)  # review fix: kept fresh


def test_extend_rejects_tombstoned_ids(ray_session, tmp_path):
    """Review fix: re-ingesting a tombstoned id would leave the new
    vector permanently masked — extend must fail loud."""
    src, d, _ = _build(tmp_path, n=150, name="reingest")
    ivf.delete_vectors(d, [7, 9])
    clash = _write_emb(
        str(tmp_path / "re.parquet"),
        _clustered(10, seed=3),
        ids=np.asarray([7, 500, 501, 502, 503, 504, 505, 506, 507, 508]),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tombstoned"):
        ivf.extend_ivf([clash], d)
    # disjoint ids still extend fine after a purge
    ivf.purge_deleted(d)
    fresh = _write_emb(
        str(tmp_path / "ok.parquet"),
        _clustered(10, seed=4),
        ids=np.arange(600, 610, dtype=np.int64),
    )
    ivf.extend_ivf([fresh], d)


def test_extend_rerun_stays_noop_after_deleting_its_ids(ray_session, tmp_path):
    """Review fix: re-submitting a COMPLETED extend must stay an
    idempotent no-op even after some of its ids were tombstoned (the
    clash check only applies to genuinely new generations)."""
    src, d, _ = _build(tmp_path, n=150, name="rerun")
    g1 = _write_emb(
        str(tmp_path / "g1.parquet"),
        _clustered(20, seed=6),
        ids=np.arange(700, 720, dtype=np.int64),
    )
    ivf.extend_ivf([g1], d)
    ivf.delete_vectors(d, [700, 701])
    meta = ivf.extend_ivf([g1], d)  # re-run: no-op, NOT a clash error
    assert len(meta["generations"]) == 2


def test_compact_ivf_retrains_and_purges(ray_session, tmp_path):
    """compact_ivf = retrain + rebalance + purge: after extends and
    deletes, the compacted layout's FULL probe equals the source's (full
    probe is exact regardless of centroids), tombstones are gone, and
    the generation bookkeeping resets."""
    import json

    src0, d, _ = _build(tmp_path, n=300, name="cmp")
    g1 = _write_emb(
        str(tmp_path / "cg1.parquet"),
        _clustered(120, seed=9),
        ids=np.arange(2000, 2120, dtype=np.int64),
    )
    ivf.extend_ivf([g1], d)
    ivf.delete_vectors(d, [3, 2001, 2005])
    new = str(tmp_path / "cmp_new")
    meta2 = ivf.compact_ivf(d, new)
    assert len(meta2["generations"]) == 1  # one fresh generation
    assert meta2["n_vectors"] == 300 + 120 - 3
    assert not os.path.exists(os.path.join(new, "tombstones.json"))
    qids = [0, 5]
    q = _queries(src0, qids)
    want, _ = ivf.probe_topk(d, qids, q, k=10, nprobe=10**9)
    got, _ = ivf.probe_topk(new, qids, q, k=10, nprobe=10**9)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    # in-place compaction refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="fresh new_dir"):
        ivf.compact_ivf(d, d)
    # idempotent: re-running returns the cached rebuild
    meta3 = ivf.compact_ivf(d, new)
    assert meta3["inputs_fingerprint"] == meta2["inputs_fingerprint"]


def test_compact_ivf_restages_after_further_deletes(ray_session, tmp_path):
    """Review fix: re-compacting into the same new_dir after MORE
    deletes on the source must restage (the staging cache is keyed by
    source meta + tombstones), not serve the stale compaction."""
    src, d, _ = _build(tmp_path, n=200, name="restage")
    new = str(tmp_path / "restage_new")
    ivf.delete_vectors(d, [1])
    m1 = ivf.compact_ivf(d, new)
    assert m1["n_vectors"] == 199
    ivf.delete_vectors(d, [2, 4])
    # same new_dir, NOT cleared: fresh staging (new source fingerprint)
    # forces build_ivf's stale-layout rebuild — and because the staging
    # lives OUTSIDE new_dir, that rmtree cannot destroy its own inputs
    m2 = ivf.compact_ivf(d, new)
    assert m2["n_vectors"] == 197  # stale staging would have said 199
