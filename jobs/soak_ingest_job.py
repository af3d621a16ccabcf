#!/usr/bin/env python
"""Soak the raw-format ingestion + big-registry percolation claims:

- WARC → canonical parquet at 8×25k-page files (one Ray task per file,
  the Common-Crawl work unit), then the ordinary build over the shards;
- percolation of the same corpus under a 512-query registry — the
  anchor table's point: a doc only fully evaluates the queries whose
  anchor terms it contains, so registry size shows up in the anchor
  fan-out, not in a docs×queries product.

Usage: python jobs/soak_ingest_job.py [--n-docs 200000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_ROOT = "/tmp/ttray_soak"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--n-files", type=int, default=8)
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

    import numpy as np

    from torchtrajectory_ray import fixtures
    from torchtrajectory_ray.config import IndexConfig
    from torchtrajectory_ray.pipelines.build import build_index
    from torchtrajectory_ray.pipelines.percolate import percolate_ds
    from torchtrajectory_ray.sources.warc import warc_to_parquet

    out: dict = {"n_docs": args.n_docs, "cpus": args.cpus}

    # stage the WARC inputs once (generation isn't the measurement)
    warc_dir = os.path.join(SOAK_ROOT, f"warc-{args.n_docs}-{args.n_files}")
    per = -(-args.n_docs // args.n_files)
    paths = []
    gen = ray.remote(num_cpus=1)(fixtures.write_warc)
    todo = []
    for i in range(args.n_files):
        p = os.path.join(warc_dir, f"crawl-{i:03d}.warc")
        paths.append(p)
        if not os.path.exists(p):
            todo.append(
                gen.remote(p, min(per, args.n_docs - i * per), i * per)
            )
    ray.get(todo)
    out["warc_bytes"] = sum(os.path.getsize(p) for p in paths)

    ingest_dir = os.path.join(warc_dir, "pages")
    t0 = time.monotonic()
    shards = warc_to_parquet(paths, ingest_dir)
    out["ingest_s"] = round(time.monotonic() - t0, 2)
    out["ingest_docs_per_s"] = round(args.n_docs / out["ingest_s"], 1)

    idx_dir = os.path.join(warc_dir, "idx")
    t0 = time.monotonic()
    m = build_index(shards, idx_dir, IndexConfig(num_term_shards=8, num_salts=8))
    out["build_s"] = round(time.monotonic() - t0, 2)
    assert m["stats"]["n_docs"] == args.n_docs

    # big-registry percolation over the ingested shards: 512 boolean
    # queries anchored across the vocabulary (each must-pair drawn from
    # the corpus vocab, so anchors really fire)
    rng = np.random.default_rng(11)
    vocab = fixtures.vocab()
    registry = [
        {
            "query_id": i,
            "q": f"+{vocab[int(rng.integers(0, 400))]} "
            f"+{vocab[int(rng.integers(0, 2000))]}",
        }
        for i in range(512)
    ]
    t0 = time.monotonic()
    n = percolate_ds(shards, registry, id_column="url").count()
    out["percolate_512q_s"] = round(time.monotonic() - t0, 2)
    out["percolate_512q_matches"] = int(n)
    out["percolate_512q_docs_per_s"] = round(
        args.n_docs / out["percolate_512q_s"], 1
    )

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
