"""End-to-end index build pipeline (the analog of ``MapMatching.start()``,
/root/reference/src/main/java/au/edu/rmit/bdm/Torch/mapMatching/
MapMatching.java:87-120 — see SURVEY.md §3.1 for the stage-by-stage map).

Output layout under ``out_dir`` (all writes atomic: tmp + rename):

    docs/docs-<shard>.parquet (+ .lineage.json)   forward index, per input
                                                  file, resumable
    segments/seg-<id>.parquet (+ .meta.json)      posting runs, per
                                                  (term_shard × salt) cell
    dict/*.parquet                                term dictionary:
                                                  term, term_id, df, max_tfn
    stats.json                                    N, avgdl, max_doc_id, shift
    manifest.json                                 config + lineage + segment
                                                  metas + stage metrics

A rerun with an existing complete manifest returns immediately; a rerun
after a partial failure skips finished docs shards and finished segment
files (per-partition checkpointing — the reference loses everything on
crash, TorSaver.java:45,257).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import ray.data

from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.stages.postings import (
    SegmentWriter,
    TokenizeCombine,
    salt_shift,
)
from torchtrajectory_ray.stages.prepare import PrepareFileTask


def _write_json(path: str, obj: Any) -> None:
    with open(path + ".tmp", "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(path + ".tmp", path)


def build_index(
    input_paths: list[str],
    out_dir: str,
    cfg: IndexConfig | None = None,
) -> dict:
    """Build a term-sharded × doc-range-salted compressed inverted index
    from raw web-page parquet files.  Returns the manifest dict."""
    cfg = cfg or IndexConfig()
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest["config"] != dataclasses.asdict(cfg):
            raise ValueError(
                f"{out_dir} holds a complete index built with a different "
                "config; use a fresh out_dir (indexes are immutable)"
            )
        if all(os.path.exists(s["path"]) for s in manifest["segments"]):
            manifest["resumed_complete"] = True
            return manifest

    docs_dir = os.path.join(out_dir, "docs")
    seg_dir = os.path.join(out_dir, "segments")
    dict_dir = os.path.join(out_dir, "dict")
    for d in (docs_dir, seg_dir, dict_dir):
        os.makedirs(d, exist_ok=True)

    t0 = time.monotonic()
    # --- stage 1: prepare docs (extract + tokenize-count), per-file
    # checkpointed.  One task per input file; lineage rows are tiny.
    files_ds = ray.data.from_items([{"path": p} for p in sorted(input_paths)])
    lineage = (
        files_ds.map_batches(
            PrepareFileTask,
            fn_constructor_kwargs={
                "docs_dir": docs_dir,
                "check_invariant": cfg.check_invariant,
            },
            batch_size=1,
            batch_format="pyarrow",
            # autoscaling pool: can make progress with one actor even when
            # the session is CPU-starved (fixed-size pools deadlock if the
            # full reservation can never be satisfied)
            concurrency=(1, cfg.tokenize_concurrency),
        )
        .take_all()
    )
    t1 = time.monotonic()

    # --- stage 2: global stats from lineage (no data pass — the analog of
    # the reference's bounding-box aggregate, VertexGridIndex.java:78-99)
    n_docs = sum(r["n_docs"] for r in lineage)
    sum_doclen = sum(r["sum_doclen"] for r in lineage)
    max_doc_id = max((r["max_doc_id"] for r in lineage), default=-1)
    avgdl = (sum_doclen / n_docs) if n_docs else 0.0
    shift = salt_shift(max_doc_id, cfg.num_salts)
    stats = {
        "n_docs": n_docs,
        "sum_doclen": sum_doclen,
        "avgdl": avgdl,
        "max_doc_id": max_doc_id,
        "salt_shift": shift,
        "k1": cfg.bm25.k1,
        "b": cfg.bm25.b,
    }
    _write_json(os.path.join(out_dir, "stats.json"), stats)

    # --- stage 3: the one all-to-all shuffle — tokenize+combine partial
    # runs, groupby(segment = term_shard × salt), merge + write segments
    docs_paths = sorted(r["output"] for r in lineage)
    docs_ds = ray.data.read_parquet(docs_paths, columns=["doc_id", "text"])
    partials = docs_ds.map_batches(
        TokenizeCombine,
        fn_constructor_kwargs={"cfg": cfg, "shift": shift},
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        concurrency=(1, cfg.tokenize_concurrency),
    )
    writer = SegmentWriter(seg_dir, cfg, avgdl)

    def write_segment_group(df):
        return writer(df)

    seg_rows = (
        partials.groupby("segment")
        .map_groups(write_segment_group, batch_format="pandas")
        .take_all()
    )
    t2 = time.monotonic()

    # --- stage 4: global term dictionary (df summed across salt runs) —
    # a small groupby over segment-file metadata columns only (parquet
    # column pruning keeps the blobs on disk).  Analog of the id lookup
    # tables the reference writes (TorSaver.java:116-141).
    seg_paths = sorted(r["path"] for r in seg_rows)
    from ray.data.aggregate import Max, Sum

    # one groupby keyed on the term string (term_id is a pure function of
    # it, recomputed after the aggregate — avoids a second shuffle)
    dict_ds = (
        ray.data.read_parquet(seg_paths, columns=["term", "df", "max_tfn"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Max("max_tfn", alias_name="max_tfn"))
    )
    from torchtrajectory_ray.functions.text import term_hash

    dict_df = dict_ds.to_pandas()
    dict_df["term_id"] = dict_df["term"].map(term_hash)
    dict_df = dict_df.sort_values("term_id").reset_index(drop=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    dict_path = os.path.join(dict_dir, "dict.parquet")
    pq.write_table(pa.Table.from_pandas(dict_df, preserve_index=False), dict_path + ".tmp")
    os.replace(dict_path + ".tmp", dict_path)
    t3 = time.monotonic()

    manifest = {
        "config": dataclasses.asdict(cfg),
        "stats": stats,
        "lineage": lineage,
        "segments": seg_rows,
        "dict_path": dict_path,
        "metrics": {
            "prepare_s": round(t1 - t0, 3),
            "index_s": round(t2 - t1, 3),
            "dict_s": round(t3 - t2, 3),
            "total_s": round(t3 - t0, 3),
            "docs_per_s": round(n_docs / (t3 - t0), 1) if t3 > t0 else 0.0,
        },
    }
    _write_json(manifest_path, manifest)
    return manifest


def build_index_from_dataset(
    ds: "ray.data.Dataset",
    out_dir: str,
    cfg: IndexConfig | None = None,
    *,
    stage_dir_name: str = "input",
) -> dict:
    """Convenience: stage an in-memory/derived Dataset to parquet shards
    under ``out_dir/input/`` then run :func:`build_index` on them.  Used
    by tests and by the driver-facing queries over the sf ``documents``
    table (which arrives as one parquet file)."""
    stage_dir = os.path.join(out_dir, stage_dir_name)
    if not os.path.exists(os.path.join(stage_dir, "_STAGED")):
        os.makedirs(stage_dir, exist_ok=True)
        ds.write_parquet(stage_dir)
        with open(os.path.join(stage_dir, "_STAGED"), "w") as f:
            f.write("ok")
    paths = [
        os.path.join(stage_dir, p)
        for p in sorted(os.listdir(stage_dir))
        if p.endswith(".parquet")
    ]
    return build_index(paths, out_dir, cfg)
