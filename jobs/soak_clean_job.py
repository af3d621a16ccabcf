#!/usr/bin/env python
"""1M-document soak of the distributed cleaning + near-dup chain.

The r2 verdict noted BASELINE.md documents the index build at 1M docs
but the data-pipeline side (clean_corpus, minhash dedup) only to 100k —
this job measures the verdict chain's constants at 1M so they are
known, not assumed.  Results go into BASELINE.md.

Generates a deterministic 1M-doc ``documents.parquet`` shard directory
under /tmp (idempotent, content-marked), with planted exact duplicates
and near duplicates so every verdict path does real work, then times:

- ``clean_verdicts`` (rule + exact-dup chain, no near-dup)
- ``clean_corpus`` (full chain incl. MinHash-LSH + distributed verify)
- ``minhash_dedup_pairs`` standalone
- skew audit: largest exact-dup group and per-reason verdict counts

Usage:  python jobs/soak_clean_job.py [--n-docs 1000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SOAK_ROOT = "/tmp/ttray_soak"
VOCAB = np.array([f"w{i:04d}" for i in range(2000)], dtype=object)


def _gen_shard(shard: int, base: int, per_shard: int, path: str) -> None:
    """Deterministic shard: zipf-ish token draws, ~4% exact dups of an
    earlier doc in the shard, ~4% near dups (2 tokens swapped), ~2%
    too-short docs so the length rule fires.  ``base`` is the GLOBAL
    first doc_id of this shard (the last shard is shorter when n_docs
    doesn't divide evenly — deriving base from its own length would
    overlap the previous shard's ids)."""
    rng = np.random.default_rng(7000 + shard)
    texts: list[str] = []
    for i in range(per_shard):
        r = rng.random()
        if i > 10 and r < 0.04:  # exact dup
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < 0.08:  # near dup: clone + mutate 2 tokens
            toks = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(2):
                toks[int(rng.integers(0, len(toks)))] = str(
                    VOCAB[int(rng.integers(0, len(VOCAB)))]
                )
            texts.append(" ".join(toks))
            continue
        n = 3 if r > 0.98 else int(rng.integers(30, 120))
        draws = (rng.random(n) ** 3 * len(VOCAB)).astype(np.int64)
        texts.append(" ".join(VOCAB[draws]))
    t = pa.table(
        {
            "doc_id": pa.array(
                np.arange(base, base + per_shard, dtype=np.int64)
            ),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * per_shard, pa.string()),
            "source": pa.array(
                [f"crawl-{shard % 8}"] * per_shard, pa.string()
            ),
        }
    )
    pq.write_table(t, path + ".tmp")
    os.replace(path + ".tmp", path)


def build_corpus(n_docs: int, n_shards: int = 64) -> str:
    """Idempotent sharded documents.parquet DIRECTORY (every pipeline
    reads it through ray.data.read_parquet / pyarrow dataset, which
    treat the directory as one table)."""
    import ray

    soak_dir = os.path.join(SOAK_ROOT, f"docs-{n_docs}")
    docs_dir = os.path.join(soak_dir, "documents.parquet")
    marker = os.path.join(soak_dir, "_COMPLETE")
    if os.path.exists(marker):
        return soak_dir
    import shutil

    shutil.rmtree(soak_dir, ignore_errors=True)
    os.makedirs(docs_dir, exist_ok=True)
    per_shard = -(-n_docs // n_shards)
    gen = ray.remote(num_cpus=1)(_gen_shard)
    ray.get(
        [
            gen.remote(
                s,
                s * per_shard,
                min(per_shard, n_docs - s * per_shard),
                os.path.join(docs_dir, f"part-{s:04d}.parquet"),
            )
            for s in range(n_shards)
            if s * per_shard < n_docs
        ]
    )
    with open(marker, "w") as f:
        f.write("ok")
    return soak_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    t0 = time.monotonic()
    soak_dir = build_corpus(args.n_docs)
    gen_s = round(time.monotonic() - t0, 1)

    from torchtrajectory_ray.pipelines import clean, dedup, textstats

    out: dict = {"n_docs": args.n_docs, "cpus": args.cpus, "gen_s": gen_s}

    t0 = time.monotonic()
    verdicts = clean.clean_corpus(soak_dir, with_near_dup=False)
    out["clean_verdicts_s"] = round(time.monotonic() - t0, 1)
    out["verdict_counts"] = (
        verdicts["reason"].value_counts().to_dict()
    )

    t0 = time.monotonic()
    full = clean.clean_corpus(soak_dir)
    out["clean_full_s"] = round(time.monotonic() - t0, 1)
    out["full_counts"] = full["reason"].value_counts().to_dict()
    out["clean_docs_per_s"] = round(args.n_docs / out["clean_full_s"], 0)

    t0 = time.monotonic()
    pairs = dedup.minhash_dedup_pairs(soak_dir)
    out["minhash_s"] = round(time.monotonic() - t0, 1)
    out["minhash_pairs"] = int(len(pairs))
    out["minhash_docs_per_s"] = round(args.n_docs / out["minhash_s"], 0)

    # skew audit: the largest exact-dup group drives the hottest shuffle
    # partition in the verdict chain
    t0 = time.monotonic()
    groups = textstats.exact_dedup(soak_dir).to_pandas()
    out["exact_dedup_s"] = round(time.monotonic() - t0, 1)
    out["max_dup_group"] = int(groups["n_dups"].max())
    out["n_distinct_texts"] = int(len(groups))

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
