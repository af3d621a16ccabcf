#!/usr/bin/env python
"""``ray job submit``-able IVF layout operations: build, extend, probe.

Mirrors ``build_index_job.py``'s discipline for the vector side — one
entry point a cluster operator can submit, resumable/idempotent layout
writes, one JSON line of metrics on success::

    # build (auto-sized nlist unless --nlist)
    python jobs/ivf_job.py build --input '/mnt/vecs/*.parquet' \
        --out /mnt/ivf-v1 [--id-col vec_id] [--nlist N] [--target-bucket-rows N]

    # append a new generation (delta files only; id overlap fails loud)
    python jobs/ivf_job.py extend --input '/mnt/vecs/new-*.parquet' \
        --out /mnt/ivf-v1

    # takedowns: tombstone ids, then make them physical
    python jobs/ivf_job.py delete --layout /mnt/ivf-v1 --ids 7,9,11
    python jobs/ivf_job.py purge --layout /mnt/ivf-v1

    # retrain + rebalance + purge into a fresh layout (generation merge)
    python jobs/ivf_job.py compact --layout /mnt/ivf-v1 --out /mnt/ivf-v2

    # batch probe: queries parquet (query_id, embedding) -> results parquet
    python jobs/ivf_job.py probe --layout /mnt/ivf-v1 \
        --queries '/mnt/queries/*.parquet' --out /mnt/results \
        [--k 10] [--nprobe 4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True, help="glob of embedding parquet files")
    b.add_argument("--out", required=True)
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--nlist", type=int, default=None, help="default: auto-derived")
    b.add_argument("--target-bucket-rows", type=int, default=None)

    e = sub.add_parser("extend")
    e.add_argument("--input", required=True, help="glob of NEW (delta) parquet files")
    e.add_argument("--out", required=True)
    e.add_argument("--allow-id-overlap", action="store_true")

    p = sub.add_parser("probe")
    p.add_argument("--layout", required=True)
    p.add_argument("--queries", required=True, help="glob of (query_id, embedding) parquet")
    p.add_argument("--out", required=True, help="results parquet directory (replaced on rerun)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument(
        "--query-salt",
        type=int,
        default=1,
        help="split each centroid's queries across S groups (bounds task "
        "memory for hot-centroid workloads at the cost of S re-reads)",
    )

    d = sub.add_parser("delete", help="tombstone vector ids (takedowns)")
    d.add_argument("--layout", required=True)
    d.add_argument(
        "--ids", required=True,
        help="comma-separated ids, or @file with one id per line",
    )

    g = sub.add_parser("purge", help="rewrite buckets without tombstoned rows")
    g.add_argument("--layout", required=True)

    c = sub.add_parser(
        "compact",
        help="retrain centroids + rebalance + purge into a fresh layout",
    )
    c.add_argument("--layout", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--nlist", type=int, default=None)

    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from torchtrajectory_ray.pipelines import ivf

    t0 = time.monotonic()
    if args.cmd == "build":
        paths = sorted(glob.glob(args.input))
        if not paths:
            raise SystemExit(f"no inputs match {args.input!r}")
        kw = {}
        if args.target_bucket_rows:
            kw["target_bucket_rows"] = args.target_bucket_rows
        meta = ivf.build_ivf(
            paths, args.out, id_col=args.id_col, nlist=args.nlist, **kw
        )
        out = {
            "cmd": "build",
            "n_vectors": meta["n_vectors"],
            "nlist": meta["nlist"],
            "n_buckets": len(meta["buckets"]),
            "total_bytes": meta["total_bytes"],
        }
    elif args.cmd == "extend":
        paths = sorted(glob.glob(args.input))
        if not paths:
            raise SystemExit(f"no inputs match {args.input!r}")
        meta = ivf.extend_ivf(
            paths, args.out, allow_id_overlap=args.allow_id_overlap
        )
        out = {
            "cmd": "extend",
            "n_vectors": meta["n_vectors"],
            "n_generations": len(meta["generations"]),
            "n_buckets": len(meta["buckets"]),
        }
    elif args.cmd == "delete":
        if args.ids.startswith("@"):
            with open(args.ids[1:]) as f:
                ids = [int(x) for x in f.read().split()]
        else:
            ids = [int(x) for x in args.ids.split(",")]
        res = ivf.delete_vectors(args.layout, ids)
        out = {"cmd": "delete", **res}
    elif args.cmd == "purge":
        res = ivf.purge_deleted(args.layout)
        out = {"cmd": "purge", **res}
    elif args.cmd == "compact":
        meta = ivf.compact_ivf(args.layout, args.out, nlist=args.nlist)
        out = {
            "cmd": "compact",
            "n_vectors": meta["n_vectors"],
            "nlist": meta["nlist"],
            "n_buckets": len(meta["buckets"]),
        }
    else:  # probe
        import shutil

        import ray.data

        qpaths = sorted(glob.glob(args.queries))
        if not qpaths:
            raise SystemExit(f"no queries match {args.queries!r}")
        # rerun = replace, not append: write_parquet into a dir with a
        # previous attempt's files would duplicate every result row
        shutil.rmtree(args.out, ignore_errors=True)
        res = ivf.probe_topk_ds(
            args.layout,
            ray.data.read_parquet(qpaths),
            k=args.k,
            nprobe=args.nprobe,
            query_salt=args.query_salt,
        )
        res.write_parquet(args.out)
        out = {"cmd": "probe", "out": args.out}
    out["wall_s"] = round(time.monotonic() - t0, 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
