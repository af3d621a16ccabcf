"""Cross-index merge (`build.merge_indexes`): rank identity vs a fresh
full build, per-source tombstone purge during staging, re-gridding, and
the fail-loud guards (dup sources, in-place, doc-id clash).  The sf0.01
oracle gate for `topk_merged` runs in test_driver_gate.py."""

from __future__ import annotations

import numpy as np
import pytest

from torchtrajectory_ray import fixtures
from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.pipelines.build import (
    build_index,
    delete_docs,
    merge_indexes,
)
from torchtrajectory_ray.state.engine import QueryEngine

N_DOCS = 240
# cross-index merge needs GLOBALLY unique ids: url-hash mode derives the
# doc id from the url, so independently built sources never collide
# (dense mode is per-build ordinal — see test_merge_doc_id_clash below)
CFG = IndexConfig(
    num_term_shards=2, num_salts=3, tokenize_batch_size=64,
    doc_id_mode="url_hash",
)


@pytest.fixture(scope="module")
def corpus_files(ray_session, tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("merge-corpus"))
    return fixtures.write_webpages(data_dir, N_DOCS, num_files=4)


def _all_queries():
    return [q["terms"] for q in fixtures.query_set(10, N_DOCS)]


def _assert_same_answers(a: QueryEngine, b: QueryEngine):
    assert a.n_docs == b.n_docs and a.avgdl == b.avgdl
    for terms in _all_queries():
        assert a.topk(terms, k=10) == b.topk(terms, k=10)
        assert a.bool_or(terms).tolist() == b.bool_or(terms).tolist()
        assert a.bool_and(terms).tolist() == b.bool_and(terms).tolist()


def test_merge_equals_full_build(corpus_files, tmp_path):
    full = str(tmp_path / "full")
    build_index(corpus_files, full, CFG)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(corpus_files[:2], a, CFG)
    build_index(corpus_files[2:], b, CFG)
    merged = str(tmp_path / "merged")
    merge_indexes([a, b], merged, CFG)
    _assert_same_answers(QueryEngine(merged), QueryEngine(full))


def test_merge_regrids_heterogeneous_sources(corpus_files, tmp_path):
    """Sources built under DIFFERENT grids merge fine — the rebuild
    re-shards everything under the target config."""
    full = str(tmp_path / "full")
    build_index(corpus_files, full, CFG)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(
        corpus_files[:2], a,
        IndexConfig(num_term_shards=1, num_salts=2, doc_id_mode="url_hash"),
    )
    build_index(
        corpus_files[2:], b,
        IndexConfig(num_term_shards=3, num_salts=1, doc_id_mode="url_hash"),
    )
    merged = str(tmp_path / "merged")
    merge_indexes([a, b], merged, CFG)
    _assert_same_answers(QueryEngine(merged), QueryEngine(full))


def test_merge_purges_each_sources_tombstones(corpus_files, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(corpus_files[:2], a, CFG)
    build_index(corpus_files[2:], b, CFG)
    victim_a = int(QueryEngine(a).bool_or(["w0000"])[0])
    victim_b = int(QueryEngine(b).bool_or(["w0000"])[-1])
    delete_docs(a, [victim_a])
    delete_docs(b, [victim_b])
    merged = str(tmp_path / "merged")
    merge_indexes([a, b], merged, CFG)
    eng = QueryEngine(merged)
    # physically gone: stats exclude them, no query path can return them
    assert eng.n_docs == N_DOCS - 2
    hits = eng.bool_or(["w0000"])
    assert victim_a not in hits and victim_b not in hits


def test_merge_doc_id_clash_fails_loud(corpus_files, tmp_path):
    """Two sources over the SAME corpus share every doc id — the
    postings shuffle's duplicate guard must kill the merge."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    dense = IndexConfig(num_term_shards=2, num_salts=3, tokenize_batch_size=64)
    build_index(corpus_files[:2], a, dense)
    build_index(corpus_files[2:], b, dense)  # dense ids restart per build
    with pytest.raises(Exception, match="duplicate doc_id"):
        merge_indexes([a, b], str(tmp_path / "merged"), CFG)


def test_merge_guards(corpus_files, tmp_path):
    a = str(tmp_path / "a")
    build_index(corpus_files[:2], a, CFG)
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes([a], str(tmp_path / "m1"), CFG)
    with pytest.raises(ValueError, match="duplicate source"):
        merge_indexes([a, a], str(tmp_path / "m2"), CFG)
    with pytest.raises(ValueError, match="fresh out_dir"):
        merge_indexes([a, str(tmp_path / "b")], a, CFG)


def test_merge_rerun_resumes_and_is_stable(corpus_files, tmp_path):
    """Re-running a finished merge resumes from its checkpoints (the
    rebuild's resumability applies) and serves identical answers; a
    crash BEFORE the manifest (simulated by deleting it) also recovers
    on re-run because staging entries are always re-created, never
    trusted."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(corpus_files[:2], a, CFG)
    build_index(corpus_files[2:], b, CFG)
    merged = str(tmp_path / "merged")
    merge_indexes([a, b], merged, CFG)
    import json
    import os

    before = QueryEngine(merged).topk(["w0000", "w0001"], k=10)
    m2 = merge_indexes([a, b], merged, CFG)  # idempotent re-run
    assert m2.get("resumed_complete", False)
    assert QueryEngine(merged).topk(["w0000", "w0001"], k=10) == before
    # simulate a crash before the manifest landed
    os.remove(os.path.join(merged, "manifest.json"))
    merge_indexes([a, b], merged, CFG)
    assert QueryEngine(merged).topk(["w0000", "w0001"], k=10) == before
