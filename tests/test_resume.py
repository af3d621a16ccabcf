"""Resume-from-checkpoint + determinism across parallelism levels.

North-rule requirements: per-partition checkpoint/lineage (re-run after a
partial failure skips finished partitions and produces byte-identical
output) and parallelism-independent results (the basis of rank identity
between the N and 4N cluster runs).
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

from torchtrajectory_ray import fixtures
from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.pipelines.build import build_index

N_DOCS = 200
CFG = dict(num_term_shards=2, num_salts=2, block_size=16,
           tokenize_batch_size=50, tokenize_concurrency=2)


def _digest(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = hashlib.sha256(
                    open(p, "rb").read()
                ).hexdigest()
    return out


def test_resume_skips_and_is_byte_identical(ray_session, tmp_path):
    data_dir = str(tmp_path / "corpus")
    paths = fixtures.write_webpages(data_dir, N_DOCS, num_files=4)

    full_dir = str(tmp_path / "full")
    m1 = build_index(paths, full_dir, IndexConfig(**CFG))
    d1 = _digest(full_dir)

    # simulate a crash: manifest missing, 2 of 4 docs shards + 1 segment
    # file lost; the prepared shards that survived must be skipped
    crash_dir = str(tmp_path / "crash")
    build_index(paths, crash_dir, IndexConfig(**CFG))
    os.remove(os.path.join(crash_dir, "manifest.json"))
    docs = sorted(
        f for f in os.listdir(os.path.join(crash_dir, "docs")) if f.endswith(".parquet")
    )
    for f in docs[:2]:
        os.remove(os.path.join(crash_dir, "docs", f))
        os.remove(os.path.join(crash_dir, "docs", f + ".lineage.json"))
    segs = sorted(
        f for f in os.listdir(os.path.join(crash_dir, "segments")) if f.endswith(".parquet")
    )
    os.remove(os.path.join(crash_dir, "segments", segs[0]))
    os.remove(os.path.join(crash_dir, "segments", segs[0] + ".meta.json"))

    m2 = build_index(paths, crash_dir, IndexConfig(**CFG))
    skipped = [r["skipped"] for r in sorted(m2["lineage"], key=lambda r: r["input"])]
    assert skipped.count(True) == 2 and skipped.count(False) == 2
    assert _digest(crash_dir) == _digest(full_dir)

    # a third run with a complete manifest short-circuits entirely
    m3 = build_index(paths, crash_dir, IndexConfig(**CFG))
    assert m3.get("resumed_complete") is True
    assert m1["stats"] == m2["stats"] == m3["stats"]


def test_output_independent_of_sharding_and_batching(ray_session, tmp_path):
    """url_hash id mode: same corpus split into different file counts and
    processed with a different batch size must produce byte-identical
    segments + stats (ids depend only on content, not layout)."""
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    pa_ = fixtures.write_webpages(str(tmp_path / "ca"), N_DOCS, num_files=4)
    pb_ = fixtures.write_webpages(str(tmp_path / "cb"), N_DOCS, num_files=7)
    ma = build_index(pa_, a_dir, IndexConfig(**CFG, doc_id_mode="url_hash"))
    mb = build_index(pb_, b_dir, IndexConfig(**{**CFG, "tokenize_batch_size": 17,
                                                "tokenize_concurrency": 3},
                                             doc_id_mode="url_hash"))
    assert ma["stats"] == mb["stats"]
    da = {k: v for k, v in _digest(a_dir).items() if k.startswith("segments/")}
    db = {k: v for k, v in _digest(b_dir).items() if k.startswith("segments/")}
    assert da == db


def test_shuffle_modes_equivalent(ray_session, tmp_path):
    """storage (external shuffle through out_dir) and groupby (object
    store sort exchange) must produce byte-identical segment files."""
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    paths = fixtures.write_webpages(str(tmp_path / "c"), N_DOCS, num_files=4)
    ma = build_index(paths, a_dir, IndexConfig(**CFG, shuffle_mode="storage"))
    mb = build_index(paths, b_dir, IndexConfig(**CFG, shuffle_mode="groupby"))
    assert ma["stats"] == mb["stats"]
    da = {k: v for k, v in _digest(a_dir).items() if k.startswith("segments/")}
    db = {k: v for k, v in _digest(b_dir).items() if k.startswith("segments/")}
    assert da and da == db


def test_output_independent_of_parallelism_dense(ray_session, tmp_path):
    """dense id mode (default): same input file list processed with a
    different batch size / concurrency must produce byte-identical
    segments — the determinism behind N-vs-4N rank identity (the input
    layout is fixed on a real cluster; only parallelism varies)."""
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    paths = fixtures.write_webpages(str(tmp_path / "c"), N_DOCS, num_files=4)
    ma = build_index(paths, a_dir, IndexConfig(**CFG))
    mb = build_index(paths, b_dir, IndexConfig(**{**CFG, "tokenize_batch_size": 17,
                                                 "tokenize_concurrency": 3}))
    assert ma["stats"] == mb["stats"]
    da = {k: v for k, v in _digest(a_dir).items() if k.startswith("segments/")}
    db = {k: v for k, v in _digest(b_dir).items() if k.startswith("segments/")}
    assert da == db


def test_extend_index_matches_full_rebuild(ray_session, tmp_path):
    """Incremental ingest (generation append) must produce the same query
    results as a fresh build over the union of inputs — same doc ids,
    same scores, same ranks (stats refreshed globally; old segments stay
    valid because block bounds are avgdl-independent)."""
    from torchtrajectory_ray.pipelines.build import extend_index
    from torchtrajectory_ray.state.engine import QueryEngine

    base = fixtures.write_webpages(str(tmp_path / "c"), N_DOCS, num_files=4)
    cfg = IndexConfig(**CFG)

    inc_dir = str(tmp_path / "inc")
    build_index(base[:2], inc_dir, cfg)
    m = extend_index(inc_dir, base[2:], cfg)
    assert m["generation"] == 1
    assert m["stats"]["n_docs"] == N_DOCS

    full_dir = str(tmp_path / "full")
    build_index(base, full_dir, cfg)

    inc, full = QueryEngine(inc_dir), QueryEngine(full_dir)
    assert inc._df == full._df                      # dictionary identical
    for q in fixtures.query_set(20, N_DOCS):
        assert inc.topk(q["terms"], k=10) == full.topk(q["terms"], k=10)
        assert inc.bool_and(q["terms"]).tolist() == full.bool_and(q["terms"]).tolist()
        assert inc.bool_or(q["terms"]).tolist() == full.bool_or(q["terms"]).tolist()


def test_extend_index_idempotent_rerun(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.build import extend_index
    from torchtrajectory_ray.state.engine import QueryEngine

    base = fixtures.write_webpages(str(tmp_path / "c"), N_DOCS, num_files=4)
    cfg = IndexConfig(**CFG)
    d = str(tmp_path / "i")
    build_index(base[:2], d, cfg)
    m1 = extend_index(d, base[2:], cfg)
    n1 = m1["stats"]["n_docs"]
    # re-running the SAME extension must be a no-op, not a duplicate gen
    m2 = extend_index(d, base[2:], cfg)
    assert m2.get("resumed_complete") is True
    assert m2["stats"]["n_docs"] == n1 == N_DOCS
    assert QueryEngine(d).n_docs == N_DOCS
