#!/usr/bin/env python
"""200k-vector soak of the round-3 IVF surface: auto-sized build,
generation extend, Dataset-native batch probe, bucket-pair near-dup.

Measures the constants behind the scale claims (BASELINE.md):

- ``build_ivf`` with auto nlist over sharded inputs (wall, derived
  nlist, split count);
- ``extend_ivf`` appending +25% more vectors (wall; no rebuild);
- ``probe_topk_ds`` with a 2,000-query batch at nprobe=4 (wall,
  queries/s, rank-identity spot check vs the driver probe);
- ``neardup_pairs`` at a near-dup threshold on the clustered corpus
  (wall, bucket-pair prune rate).

Usage: python jobs/soak_ivf_job.py [--n-vecs 200000] [--cpus 32]
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
DIM = 64
N_CENTERS = 64


def _gen_vec_shard(
    shard: int, base: int, n: int, path: str, seed_centers: int
) -> None:
    rng = np.random.default_rng(8000 + shard)
    crng = np.random.default_rng(seed_centers)
    centers = crng.normal(size=(N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    which = rng.integers(0, N_CENTERS, size=n)
    vecs = centers[which] + 0.05 * rng.normal(size=(n, DIM))
    # ~2% planted near-copies of an earlier row in the shard so the
    # near-dup stage finds real pairs
    n_dup = n // 50
    if n_dup and n > 10:
        srcs = rng.integers(0, n - 1, size=n_dup)
        dsts = rng.integers(1, n, size=n_dup)
        vecs[dsts] = vecs[srcs] + 1e-3 * rng.normal(size=(n_dup, DIM))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(
                    np.arange(base, base + n, dtype=np.int64)
                ),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        path + ".tmp",
    )
    os.replace(path + ".tmp", path)


def build_vectors(n: int, tag: str, base: int = 0, n_shards: int = 32) -> list[str]:
    import ray

    d = os.path.join(SOAK_ROOT, f"vecs-{tag}-{n}-{base}")
    marker = os.path.join(d, "_COMPLETE")
    per = -(-n // n_shards)
    # only shards with s*per < n exist — the cached branch must apply
    # the same filter or a rerun returns paths to never-written files
    paths = [
        os.path.join(d, f"part-{s:04d}.parquet")
        for s in range(n_shards)
        if s * per < n
    ]
    if os.path.exists(marker):
        return paths
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    gen = ray.remote(num_cpus=1)(_gen_vec_shard)
    ray.get(
        [
            gen.remote(s, base + s * per, min(per, n - s * per), p, 77)
            for s, p in enumerate(paths)
        ]
    )
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-vecs", type=int, default=200_000)
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
    from torchtrajectory_ray.pipelines import ivf

    out: dict = {"n_vecs": args.n_vecs, "cpus": args.cpus, "dim": DIM}
    base_paths = build_vectors(args.n_vecs, "ivfsoak")
    layout = os.path.join(SOAK_ROOT, f"ivf-layout-{args.n_vecs}")
    import shutil

    shutil.rmtree(layout, ignore_errors=True)
    os.makedirs(layout, exist_ok=True)

    t0 = time.monotonic()
    # target 2048 rows/bucket: auto nlist lands ABOVE the corpus's ~64
    # natural clusters, so bucket radii stay tight and the near-dup
    # prune has teeth (nlist below the cluster count would fuse clusters
    # into wide-radius buckets — correct but pruneless)
    meta = ivf.build_ivf(
        base_paths, layout, id_col="vec_id", nlist=None, target_bucket_rows=2048
    )
    out["build_s"] = round(time.monotonic() - t0, 1)
    out["nlist"] = meta["nlist"]
    out["n_buckets"] = len(meta["buckets"])
    out["build_vecs_per_s"] = round(args.n_vecs / out["build_s"], 0)

    ext_paths = build_vectors(
        args.n_vecs // 4, "ivfsoak-ext", base=args.n_vecs
    )
    t0 = time.monotonic()
    meta = ivf.extend_ivf(ext_paths, layout)
    out["extend_s"] = round(time.monotonic() - t0, 1)
    out["extend_vecs_per_s"] = round((args.n_vecs // 4) / out["extend_s"], 0)
    out["n_vectors_after_extend"] = meta["n_vectors"]

    # 2,000-query batch through the Dataset-native probe
    n_q = 2000
    q_paths = build_vectors(n_q, "ivfsoak-q", base=10_000_000)
    queries = ray.data.read_parquet(q_paths).rename_columns(
        ["query_id", "embedding"]
    )
    t0 = time.monotonic()
    res = ivf.probe_topk_ds(layout, queries, k=10, nprobe=4).to_pandas()
    out["batch_probe_s"] = round(time.monotonic() - t0, 1)
    out["batch_probe_qps"] = round(n_q / out["batch_probe_s"], 0)
    out["batch_probe_rows"] = int(len(res))

    # spot-check rank identity vs the driver probe on 5 queries
    spot = sorted(res["query_id"].unique())[:5]
    qt = pq.read_table(q_paths[0])
    ids = qt["vec_id"].to_numpy()
    sel = [int(np.where(ids == s)[0][0]) for s in spot]
    qm = np.array(
        [qt["embedding"][i].as_py() for i in sel], dtype=np.float64
    )
    drv, _ = ivf.probe_topk(layout, spot, qm, k=10, nprobe=4)
    got = (
        res[res.query_id.isin(spot)]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    drv = drv.sort_values(["query_id", "rank"]).reset_index(drop=True)
    out["batch_probe_rank_identical"] = bool(
        drv[["query_id", "rank", "neighbor_id"]].equals(
            got[["query_id", "rank", "neighbor_id"]]
        )
    )

    # branch-and-bound EXACT probe on the clustered soak corpus: must
    # equal the fullprobe answer while reading a fraction of the layout
    t0 = time.monotonic()
    ex, ex_stats = ivf.probe_topk_exact(layout, spot, qm, k=10, nprobe0=4)
    out["exact_probe_s"] = round(time.monotonic() - t0, 2)
    full, _ = ivf.probe_topk(layout, spot, qm, k=10, nprobe=10**9)
    out["exact_probe_equals_fullprobe"] = bool(
        ex.sort_values(["query_id", "rank"]).reset_index(drop=True).equals(
            full.sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
    )
    out["exact_probe_buckets"] = int(ex_stats["n_buckets_probed"])
    out["exact_probe_bytes_frac"] = round(
        ex_stats["bytes_read"] / max(1, ex_stats["total_bytes"]), 3
    )
    out["exact_probe_phases"] = int(ex_stats["phases"])

    t0 = time.monotonic()
    pairs, stats = ivf.neardup_pairs(layout, 0.92)
    out["neardup_s"] = round(time.monotonic() - t0, 1)
    out["neardup_pairs"] = int(len(pairs))
    out["neardup_prune_rate"] = round(
        stats["n_pruned"] / max(1, stats["n_bucket_pairs"]), 3
    )

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
