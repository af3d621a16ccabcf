"""Continuous-ingest daemon (pipelines/ingest.py): micro-batch appended
generations must answer identically to a one-shot rebuild, and the loop
must be resumable at any crash point (the lineage IS the ledger)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from torchtrajectory_ray import fixtures
from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.pipelines import ingest
from torchtrajectory_ray.pipelines.build import build_index
from torchtrajectory_ray.state.engine import QueryEngine

CFG = dict(num_term_shards=2, num_salts=2, tokenize_batch_size=64)


def _drop_batch(watch: str, batch: int, n: int, start: int) -> None:
    """One micro-batch of mixed-format sources; names sort by batch so
    the incremental ingest order equals the one-shot sorted order."""
    fixtures.write_warc(os.path.join(watch, f"b{batch}-0.warc"), n, start)
    fixtures.write_jsonl(
        os.path.join(watch, f"b{batch}-1.jsonl"), n, start + n
    )


def _topk_workload(eng: QueryEngine):
    out = []
    for terms in (["the"], ["data", "search"], ["the", "data", "web"]):
        out.append(eng.topk(terms, k=10))
        out.append(sorted(map(int, eng.bool_or(terms))))
    return out


def test_micro_batches_equal_one_shot_rebuild(ray_session, tmp_path):
    watch = str(tmp_path / "watch")
    work = str(tmp_path / "work")
    idx = str(tmp_path / "live")
    os.makedirs(watch)
    cfg = IndexConfig(**CFG)

    # three ticks: build, extend, extend
    results = []
    for b in range(3):
        _drop_batch(watch, b, 40, b * 80)
        results.append(ingest.ingest_tick(watch, work, idx, cfg))
    assert [r["n_new"] for r in results] == [2, 2, 2]
    assert results[-1]["generation"] == 2

    # idle tick: nothing new, generation unchanged
    r = ingest.ingest_tick(watch, work, idx, cfg)
    assert r["n_new"] == 0 and r["generation"] == 2

    # one-shot rebuild over the SAME converted shards
    shards = sorted(glob.glob(os.path.join(work, "pages", "*.parquet")))
    assert len(shards) == 6
    full = str(tmp_path / "full")
    build_index(shards, full, cfg)

    ei, ef = QueryEngine(idx), QueryEngine(full)
    got, exp = _topk_workload(ei), _topk_workload(ef)
    for a, b in zip(got, exp):
        if isinstance(a, list) and a and isinstance(a[0], tuple):
            assert [x[0] for x in a] == [x[0] for x in b]
            assert np.allclose([x[1] for x in a], [x[1] for x in b], atol=1e-12)
        else:
            assert a == b


def test_crash_window_between_extend_and_next_tick(ray_session, tmp_path):
    """Simulated crash AFTER a successful extension: the next tick must
    not re-ingest the same sources (the manifest lineage is the ledger),
    and new arrivals still ingest."""
    watch = str(tmp_path / "watch")
    work = str(tmp_path / "work")
    idx = str(tmp_path / "live")
    os.makedirs(watch)
    cfg = IndexConfig(**CFG)
    _drop_batch(watch, 0, 30, 0)
    ingest.ingest_tick(watch, work, idx, cfg)
    _drop_batch(watch, 1, 30, 60)
    ingest.ingest_tick(watch, work, idx, cfg)
    n_docs_after = QueryEngine(idx).n_docs

    # "crash" = simply calling tick again with the same watch state
    r = ingest.ingest_tick(watch, work, idx, cfg)
    assert r["n_new"] == 0
    assert QueryEngine(idx).n_docs == n_docs_after

    # a new file plus the old ones: only the new one ingests
    fixtures.write_warc(os.path.join(watch, "b2-0.warc"), 20, 200)
    r = ingest.ingest_tick(watch, work, idx, cfg)
    assert r["n_new"] == 1
    assert QueryEngine(idx).n_docs == n_docs_after + 20


def test_daemon_loop_idle_stop(ray_session, tmp_path):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    fixtures.write_warc(os.path.join(watch, "a.warc"), 25, 0)
    res = ingest.ingest_daemon(
        watch,
        str(tmp_path / "work"),
        str(tmp_path / "live"),
        IndexConfig(**CFG),
        poll_s=0.01,
        idle_stop_after=2,
        min_age_s=0.0,
    )
    assert [r["n_new"] for r in res] == [1, 0, 0]
    eng = QueryEngine(str(tmp_path / "live"))
    assert eng.n_docs == 25


def test_quiescence_window_skips_fresh_files(ray_session, tmp_path):
    """A file modified within min_age_s (possibly mid-copy) must wait
    for the next poll instead of being ingested truncated."""
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    fixtures.write_warc(os.path.join(watch, "a.warc"), 10, 0)
    r = ingest.ingest_tick(
        watch,
        str(tmp_path / "work"),
        str(tmp_path / "live"),
        IndexConfig(**CFG),
        min_age_s=60.0,
    )
    assert r["n_new"] == 0  # too fresh this tick
    r = ingest.ingest_tick(
        watch,
        str(tmp_path / "work"),
        str(tmp_path / "live"),
        IndexConfig(**CFG),
        min_age_s=0.0,
    )
    assert r["n_new"] == 1


def test_cross_format_stem_collision_fails_loud(ray_session, tmp_path):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    fixtures.write_warc(os.path.join(watch, "x.warc"), 5, 0)
    fixtures.write_jsonl(os.path.join(watch, "x.jsonl"), 5, 10)
    with pytest.raises(ValueError, match="basename stem"):
        ingest.ingest_tick(
            watch,
            str(tmp_path / "work"),
            str(tmp_path / "live"),
            IndexConfig(**CFG),
        )
