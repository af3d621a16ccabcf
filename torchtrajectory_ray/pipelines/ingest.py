"""Continuous-ingest driver loop: watch a source directory, convert new
WARC / JSONL / parquet page files to canonical shards, and append them
to a live index in micro-batches.

The web-text analog of the reference's replay simulator + streaming
window recompute (clustering/Streaming/Simulator.java:10-105,
Streaming.java:25-46), done Lucene-style: each micro-batch becomes one
immutable index GENERATION via :func:`pipelines.build.extend_index`, so
N appended micro-batches answer queries identically to a one-shot
rebuild over the union (ids AND scores — tested).

Crash-safety has no separate ledger: the set of already-ingested source
files is derived from the index manifest's lineage (the ``input`` field
of every docs shard), and the conversion layer keeps its own per-file
sidecar checkpoints.  A crash between conversion and extension re-runs
both idempotently; a crash between extension and nothing (extension IS
the last step) is simply a completed tick.
"""

from __future__ import annotations

import json
import os
import time

SOURCE_EXTS = (".warc", ".jsonl", ".parquet")


def discover_sources(watch_dir: str, min_age_s: float = 2.0) -> list[str]:
    """Supported page files currently in the watch dir, sorted (the
    ingest order — doc ids are deterministic given it).

    ``min_age_s`` is the quiescence window: a file modified within it is
    skipped this tick (it may still be mid-copy) and picked up on the
    next poll.  The watch contract is APPEND-ONLY: sources must stop
    changing once quiesced — mutating an already-ingested file is not
    re-ingested (the manifest lineage marks its shard done) and leaves
    the pages dir disagreeing with the live index."""
    now = time.time()
    out = []
    for name in sorted(os.listdir(watch_dir)):
        p = os.path.join(watch_dir, name)
        if not (os.path.isfile(p) and name.endswith(SOURCE_EXTS)):
            continue
        if min_age_s > 0 and now - os.path.getmtime(p) < min_age_s:
            continue  # possibly mid-copy — wait for quiescence
        out.append(p)
    return out


def ingested_inputs(index_dir: str) -> set[str]:
    """Absolute converted-shard paths already in the index, derived from
    the manifest lineage — the crash-safe 'ledger'."""
    manifest_path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(manifest_path):
        return set()
    with open(manifest_path) as f:
        manifest = json.load(f)
    return {os.path.abspath(r["input"]) for r in manifest["lineage"]}


def _convert(sources: list[str], pages_dir: str, bad_records: str) -> dict[str, str]:
    """source path → canonical shard path; WARC/JSONL are converted
    (per-file checkpointed, reruns skip), parquet passes through."""
    from torchtrajectory_ray.sources.jsonl import jsonl_to_parquet
    from torchtrajectory_ray.sources.warc import shard_stem, warc_to_parquet

    os.makedirs(pages_dir, exist_ok=True)
    mapping: dict[str, str] = {}
    warcs = [p for p in sources if p.endswith(".warc")]
    jsonls = [p for p in sources if p.endswith(".jsonl")]
    if warcs:
        warc_to_parquet(warcs, pages_dir, bad_records=bad_records)
        for p in warcs:
            mapping[p] = os.path.join(
                pages_dir, f"pages-{shard_stem(p, '.warc')}.parquet"
            )
    if jsonls:
        jsonl_to_parquet(jsonls, pages_dir, bad_records=bad_records)
        for p in jsonls:
            mapping[p] = os.path.join(
                pages_dir, f"pages-{shard_stem(p, '.jsonl')}.parquet"
            )
    for p in sources:
        if p.endswith(".parquet"):
            mapping[p] = p
    return mapping


def ingest_tick(
    watch_dir: str,
    work_dir: str,
    index_dir: str,
    cfg=None,
    *,
    bad_records: str = "drop",
    min_age_s: float = 0.0,
) -> dict:
    """ONE micro-batch: discover → convert new files → build or extend.

    Returns {"n_new": int, "sources": [...], "generation": int}.
    Safe to re-run at any point: conversion skips finished shards and
    ``extend_index`` is idempotent for an exact re-run of the last
    extension.  Direct callers control arrival so ``min_age_s`` defaults
    to 0; the polling daemon passes its quiescence window through."""
    from torchtrajectory_ray.config import IndexConfig
    from torchtrajectory_ray.pipelines.build import build_index, extend_index

    cfg = cfg or IndexConfig()
    sources = discover_sources(watch_dir, min_age_s=min_age_s)
    # one converted-shard name per source across ALL formats: x.warc and
    # x.jsonl would both become pages-x.parquet and silently overwrite
    # each other — fail loud instead
    stems = [
        os.path.splitext(os.path.basename(p))[0]
        for p in sources
        if not p.endswith(".parquet")
    ]
    dups = sorted({s for s in stems if stems.count(s) > 1})
    if dups:
        raise ValueError(
            "watch dir holds sources in different formats sharing a "
            f"basename stem (would overwrite each other's shards): {dups}"
        )
    mapping = _convert(sources, os.path.join(work_dir, "pages"), bad_records)
    done = ingested_inputs(index_dir)
    new_shards = sorted(
        shard
        for shard in mapping.values()
        if os.path.abspath(shard) not in done
    )
    if not new_shards:
        return {"n_new": 0, "sources": [], "generation": _generation(index_dir)}
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        manifest = build_index(new_shards, index_dir, cfg)
    else:
        manifest = extend_index(index_dir, new_shards, cfg)
    return {
        "n_new": len(new_shards),
        "sources": new_shards,
        "generation": int(manifest.get("generation", 0)),
    }


def _generation(index_dir: str) -> int:
    p = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(json.load(f).get("generation", 0))


def ingest_daemon(
    watch_dir: str,
    work_dir: str,
    index_dir: str,
    cfg=None,
    *,
    poll_s: float = 5.0,
    max_ticks: int | None = None,
    idle_stop_after: int | None = None,
    min_age_s: float = 2.0,
    on_tick=None,
) -> list[dict]:
    """Poll ``watch_dir`` and ingest micro-batches until ``max_ticks``
    ticks have run or ``idle_stop_after`` consecutive empty ticks pass
    (both None = run forever).  ``min_age_s`` skips files modified
    within the window (mid-copy protection).  Returns the per-tick
    results."""
    results: list[dict] = []
    idle = 0
    while True:
        res = ingest_tick(
            watch_dir, work_dir, index_dir, cfg, min_age_s=min_age_s
        )
        results.append(res)
        if on_tick is not None:
            on_tick(res)
        idle = idle + 1 if res["n_new"] == 0 else 0
        if max_ticks is not None and len(results) >= max_ticks:
            break
        if idle_stop_after is not None and idle >= idle_stop_after:
            break
        time.sleep(poll_s)
    return results
