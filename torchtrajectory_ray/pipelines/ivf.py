"""Bucket-partitioned IVF index over an embedding column — the scale
path for similarity search AND embedding near-dup.

Structural analog of the reference's grid index + candidate ring probe
(/root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/spatialIndex/
LEVI.java:95-112 — bound candidates by geometry, exact-score only the
candidates), re-expressed for the cosine sphere:

- **build**: centroids trained on a DISTRIBUTED deterministic sample
  (hash-mod inside ``map_batches`` — the driver only ever holds the
  small sample and the nlist×dim centroid matrix), then one assign pass
  writes vectors into ``bucket-NNNNN/`` parquet directories (one file per
  input block, content-addressed + atomic ⇒ resumable).  Per-bucket
  metadata records the bucket's angular RADIUS (max angle member↔
  centroid) — the exactness lever below.
- **scale-adaptive sizing**: ``nlist`` defaults to
  ``clamp(ceil(n_rows / target_bucket_rows), 16, 65536)`` so bucket size
  tracks a fixed target as the corpus grows (the reference's analog is
  the grid's per-tile population bound, VertexGridIndex.java:24 — scaled
  with the data, never pinned).  Any bucket that still exceeds
  ``max_bucket_rows`` (a mega-cluster of near-identical vectors k-means
  cannot separate) is SPLIT by id-hash into sub-buckets sharing the
  parent centroid, so per-task memory in the probe and the bucket-pair
  near-dup is bounded by ``2 × max_bucket_rows`` rows no matter how
  skewed the corpus.
- **probe** (``probe_topk``): queries rank CENTROIDS and read ONLY the
  buckets of their ``nprobe`` best centroids — real IO pruning
  (directory selection), not a scan-and-mask.  Bytes touched vs total
  are reported for audit.
- **near-dup** (``neardup_pairs``): exact all-pairs ≥ threshold without
  any full-matrix broadcast.  Buckets partition the vectors, tasks work
  on bucket PAIRS, and the triangle inequality on the sphere prunes
  pairs that cannot contain a qualifying vector pair:

      θ(a,b) ≤ α  ⇒  θ(c_a,c_b) ≤ R_a + α + R_b

  so a bucket pair with θ(c_i,c_j) − R_i − R_j > α is skipped with NO
  false negatives (sub-buckets of one centroid have θ = 0 and always
  survive each other — correct, and their tasks are bounded by the
  split).  High thresholds (real near-dup territory) prune most of the
  grid; at a permissive threshold it degrades gracefully into a
  distributed block-pair join — still exact, still O(bucket) memory per
  task, never O(n) driver state.
- **extend** (``extend_ivf``): generation-append new vectors into the
  existing layout under the FROZEN centroids (assign-only pass, atomic
  meta swap, oversize splits re-checked) — the same append discipline as
  the text index's ``extend_index``.  Exact consumers (near-dup,
  full-probe knn) return identical answers over an extended layout and a
  fresh rebuild of the union; partial probes may differ because a
  rebuild retrains centroids.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

CACHE_ROOT = "/tmp/ttray_cache"

# auto-sizing defaults: average bucket tracks TARGET rows; a bucket past
# MAX (skew, mega-clusters) is split by id-hash until it fits
TARGET_BUCKET_ROWS = 8192
MIN_NLIST = 16
MAX_NLIST = 65536
# deterministic id mixer for sub-bucket assignment (splitmix64 constant)
_MIX = np.uint64(0x9E3779B97F4A7C15)

# scalar quantization: components of a UNIT vector live in [-1, 1], so a
# fixed code scale of 127 needs no training and is frozen forever (no
# per-layout calibration state to version).  Per-component error ≤
# 0.5/127, so for a unit query q the dot-product error is bounded by
# ||q||·||err||₂ ≤ sqrt(dim)/254 — the margin the exact rescore uses.
_SQ8_SCALE = 127.0


def _sq8_error_bound(dim: int) -> float:
    return math.sqrt(dim) / (2.0 * _SQ8_SCALE)


def _sq8_list_array(e_norm: np.ndarray) -> pa.ListArray:
    """int8 codes of a row-normalized matrix as a list<int8> column."""
    codes = np.rint(e_norm * _SQ8_SCALE).astype(np.int8)
    n, dim = codes.shape
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(codes.ravel()))


def _sq8_matrix(batch: pa.Table) -> np.ndarray:
    """Dequantized (approx-unit) float matrix from the sq8 column."""
    c = batch["embedding_sq8"]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(c), -1) / _SQ8_SCALE


def _column_bytes(files: list[str], top_level_names: set[str]) -> int:
    """Compressed on-disk bytes of the given top-level columns across the
    files, from parquet metadata (what a projected read actually pays —
    file sizes overstate it once a file carries multiple columns)."""
    tot = 0
    for p in files:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            r = md.row_group(rg)
            for i in range(r.num_columns):
                col = r.column(i)
                if col.path_in_schema.split(".")[0] in top_level_names:
                    tot += col.total_compressed_size
    return tot


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(c), -1)


def auto_nlist(n_rows: int, target_bucket_rows: int = TARGET_BUCKET_ROWS) -> int:
    """Centroid count derived from corpus size so the AVERAGE bucket
    holds ~target rows at any scale (floor keeps pruning meaningful on
    tiny corpora; cap bounds the broadcast centroid matrix)."""
    return min(MAX_NLIST, max(MIN_NLIST, math.ceil(n_rows / target_bucket_rows)))


def _assign_vectors(C: np.ndarray, e: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(argmax centroid id, best cos) per row — row-chunked so the
    nlist × chunk similarity block stays small even at nlist = 65536."""
    ch = max(16, 4_000_000 // max(1, len(C)))
    assign = np.empty(len(e), np.int64)
    best = np.empty(len(e), np.float64)
    for lo in range(0, len(e), ch):
        hi = min(lo + ch, len(e))
        sims = C @ e[lo:hi].T  # nlist × ch
        a = np.argmax(sims, axis=0)
        assign[lo:hi] = a
        best[lo:hi] = sims[a, np.arange(hi - lo)]
    return assign, best


def _lloyd(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Seeded spherical k-means on the (small) sample matrix; returns
    unit-norm centroids.  Centroid updates are one add.at pass per
    iteration (no per-cluster Python loop), so nlist in the tens of
    thousands stays cheap; empty clusters keep their previous centroid."""
    s = _norm_rows(sample)
    nlist = min(nlist, len(s))
    rng = np.random.default_rng(seed)
    c = s[rng.choice(len(s), size=nlist, replace=False)]
    for _ in range(iters):
        assign, _ = _assign_vectors(c, s)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, s)
        cnt = np.bincount(assign, minlength=nlist)
        nz = cnt > 0
        c[nz] = sums[nz] / cnt[nz, None]
        c = _norm_rows(c)
    return c


def _content_tag(ids: np.ndarray) -> str:
    return hashlib.blake2b(ids.tobytes(), digest_size=6).hexdigest()


_PARTIAL_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("n", pa.int64()),
        ("min_cos", pa.float64()),
        ("path", pa.string()),
        ("bytes", pa.int64()),
    ]
)


def _write_bucket_part(
    out_dir: str, bucket: int, sub: pa.Table, ids: np.ndarray
) -> dict:
    """Content-addressed atomic parquet append under bucket-NNNNN/;
    idempotent across task retries and reruns."""
    bdir = os.path.join(out_dir, f"bucket-{bucket:05d}")
    os.makedirs(bdir, exist_ok=True)
    path = os.path.join(bdir, f"part-{_content_tag(ids)}.parquet")
    if not os.path.exists(path):
        pq.write_table(sub, path + ".tmp")
        os.replace(path + ".tmp", path)
    return {"path": os.path.relpath(path, out_dir), "bytes": os.path.getsize(path)}


class _AssignWrite:
    """map_batches task: batch → per-bucket parquet appends; returns one
    partial row per touched bucket (n, min_cos member↔centroid, file
    path, bytes).  Writes are content-addressed + atomic ⇒ idempotent."""

    def __init__(self, out_dir: str, centroids: np.ndarray, id_col: str):
        self.out_dir = out_dir
        self.c = centroids
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        if batch.num_rows == 0:  # 0-row input shards are legal
            return _PARTIAL_SCHEMA.empty_table()
        e = _norm_rows(_batch_matrix(batch))
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        assign, best = _assign_vectors(self.c, e)
        rows = []
        for b in np.unique(assign):
            m = assign == b
            sub = batch.filter(pa.array(m)).append_column(
                "bucket", pa.array(np.full(int(m.sum()), b, np.int32))
            )
            if "embedding_sq8" not in sub.column_names:
                sub = sub.append_column("embedding_sq8", _sq8_list_array(e[m]))
            part = _write_bucket_part(self.out_dir, int(b), sub, ids[m])
            rows.append(
                {
                    "bucket": int(b),
                    "n": int(m.sum()),
                    "min_cos": float(best[m].min()),
                    **part,
                }
            )
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


class _SplitWrite:
    """map_batches task for the oversize-bucket split: rows of ONE parent
    bucket → id-hash-assigned sub-buckets (deterministic: depends only on
    the id, never on batch boundaries), each inheriting the parent
    centroid.  min_cos is recomputed per sub-bucket from its members, so
    sub radii can only tighten."""

    def __init__(
        self, out_dir: str, sub_ids: list[int], centroid: np.ndarray, id_col: str
    ):
        self.out_dir = out_dir
        self.sub_ids = np.asarray(sub_ids, np.int64)
        self.centroid = centroid
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        if batch.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        mixed = (ids.astype(np.uint64) * _MIX) >> np.uint64(32)
        sub = self.sub_ids[(mixed % np.uint64(len(self.sub_ids))).astype(np.int64)]
        cos = _norm_rows(_batch_matrix(batch)) @ self.centroid
        batch = batch.drop_columns(["bucket"])
        rows = []
        for b in np.unique(sub):
            m = sub == b
            t = batch.filter(pa.array(m)).append_column(
                "bucket", pa.array(np.full(int(m.sum()), b, np.int32))
            )
            part = _write_bucket_part(self.out_dir, int(b), t, ids[m])
            rows.append(
                {
                    "bucket": int(b),
                    "n": int(m.sum()),
                    "min_cos": float(cos[m].min()),
                    **part,
                }
            )
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


def _merge_partials(
    out_dir: str, buckets: dict[str, dict], partials: pd.DataFrame, cent_of: dict
) -> None:
    """Fold assign/split partial rows into the meta bucket table (n +=,
    min_cos = min, path union, bytes from the filesystem)."""
    for b, g in (partials.groupby("bucket") if len(partials) else ()):
        key = str(int(b))
        prev = buckets.get(key)
        paths = sorted(set(g["path"]) | set(prev["paths"] if prev else ()))
        buckets[key] = {
            "n": int(g["n"].sum()) + (prev["n"] if prev else 0),
            "min_cos": min(
                float(g["min_cos"].min()),
                prev["min_cos"] if prev else 1.0,
            ),
            "paths": paths,
            "bytes": int(
                sum(os.path.getsize(os.path.join(out_dir, p)) for p in paths)
            ),
            "centroid": int(cent_of[int(b)]),
        }


def _compact_buckets(
    out_dir: str, buckets: dict[str, dict], max_files: int = 4
) -> list[str]:
    """Rewrite any bucket holding more than ``max_files`` part files
    into ONE id-sorted file (distributed, one task per bucket batch).

    The assign pass writes a part per (input block × bucket), so a
    bucket accumulates O(n_blocks) tiny files — at 200k vectors the
    bucket-pair near-dup spent ~80% of its wall on per-file parquet
    open/footer overhead re-reading them.  Compaction is content-
    addressed and idempotent; the OLD files are returned for the caller
    to delete only after the meta that stops referencing them is
    durable (same discipline as the split pass; a crash in between
    leaves a readable layout either way)."""
    work = sorted(
        (int(k) for k, v in buckets.items() if len(v["paths"]) > max_files)
    )
    if not work:
        return []
    # only the oversized buckets are compacted — don't ship every
    # bucket's path list in the task closure
    paths_of = {
        b: [os.path.join(out_dir, p) for p in buckets[str(b)]["paths"]]
        for b in work
    }

    def compact_batch(batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        rows = []
        for b in batch["bucket"].to_pylist():
            t = pq.read_table(paths_of[int(b)])
            id_col = [
                c
                for c in t.column_names
                if c not in ("embedding", "embedding_sq8", "bucket")
            ][0]
            ids = t[id_col].to_numpy().astype(np.int64)
            order = np.argsort(ids, kind="stable")
            t = t.take(pa.array(order))
            part = _write_bucket_part(out_dir, int(b), t, ids[order])
            rows.append({"bucket": int(b), **part})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("bucket", pa.int64()),
                    ("path", pa.string()),
                    ("bytes", pa.int64()),
                ]
            ),
        )

    n_tasks = min(64, len(work))
    done = (
        ray.data.from_arrow(
            pa.table({"bucket": pa.array(work, pa.int64())})
        )
        .repartition(n_tasks)  # one block would serialize the rewrite
        .map_batches(
            compact_batch,
            batch_format="pyarrow",
            batch_size=max(1, -(-len(work) // n_tasks)),
        )
        .to_pandas()
    )
    to_remove: list[str] = []
    for _, row in done.iterrows():
        key = str(int(row["bucket"]))
        old = buckets[key]["paths"]
        to_remove.extend(
            os.path.join(out_dir, p) for p in old if p != row["path"]
        )
        buckets[key]["paths"] = [row["path"]]
        buckets[key]["bytes"] = int(row["bytes"])
    return to_remove


def _split_oversized(
    out_dir: str,
    centroids: np.ndarray,
    buckets: dict[str, dict],
    next_bucket_id: int,
    id_col: str,
    target_bucket_rows: int,
    max_bucket_rows: int,
) -> tuple[int, list[str]]:
    """Split every bucket over ``max_bucket_rows`` into ~target-row
    sub-buckets (id-hash assignment, deterministic).  Parent directories
    are only REMOVED by the caller after the new meta is durably written;
    returns (next_bucket_id, parent dirs now superseded)."""
    to_remove: list[str] = []
    for _ in range(5):  # recursion guard; one round almost always suffices
        over = sorted(
            (k for k, v in buckets.items() if v["n"] > max_bucket_rows), key=int
        )
        if not over:
            break
        for key in over:
            info = buckets.pop(key)
            n_sub = math.ceil(info["n"] / target_bucket_rows)
            sub_ids = list(range(next_bucket_id, next_bucket_id + n_sub))
            next_bucket_id += n_sub
            cvec = centroids[info["centroid"]]
            partials = (
                ray.data.read_parquet(
                    [os.path.join(out_dir, p) for p in info["paths"]]
                )
                .map_batches(
                    _SplitWrite(out_dir, sub_ids, cvec, id_col),
                    batch_format="pyarrow",
                    batch_size=4096,
                )
                .to_pandas()
            )
            _merge_partials(
                out_dir, buckets, partials, {b: info["centroid"] for b in sub_ids}
            )
            to_remove.append(os.path.join(out_dir, f"bucket-{int(key):05d}"))
    return next_bucket_id, to_remove


def _write_meta(out_dir: str, meta: dict) -> None:
    meta_path = os.path.join(out_dir, "meta.json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)


def _gen_fp(g) -> str:
    """Fingerprint of a generation record (compat: early metas stored
    bare fingerprint strings)."""
    return g if isinstance(g, str) else g["fp"]


def _id_range(input_paths: list[str], id_col: str) -> tuple[int, int] | None:
    """[min, max] of the id column across the inputs, from parquet
    row-group STATISTICS only (no data read); None if any file lacks
    stats."""
    lo = hi = None
    for p in input_paths:
        md = pq.ParquetFile(p).metadata
        col_idx = None
        if md.num_row_groups == 0:
            continue
        rg0 = md.row_group(0)
        for i in range(rg0.num_columns):
            if rg0.column(i).path_in_schema == id_col:
                col_idx = i
                break
        if col_idx is None:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            if st is None or st.min is None or st.max is None:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        return None
    return int(lo), int(hi)


def _make_generation(input_paths: list[str], id_col: str, fp: str, n: int) -> dict:
    rng = _id_range(input_paths, id_col)
    return {
        "fp": fp,
        "id_min": rng[0] if rng else None,
        "id_max": rng[1] if rng else None,
        "n": int(n),
    }


def build_ivf(
    input_paths: list[str],
    out_dir: str,
    *,
    id_col: str = "vec_id",
    nlist: int | None = None,
    sample_mod: int | None = None,
    iters: int = 10,
    seed: int = 42,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
    max_bucket_rows: int | None = None,
) -> dict:
    """Build (or reuse) the bucket-partitioned layout; returns the meta
    dict.  ``nlist=None`` derives the centroid count from the corpus size
    (:func:`auto_nlist`) — the scale-safe default; pass an int to pin it.
    ``sample_mod``: train centroids on ids with id % mod == 0
    (deterministic distributed sample); default caps the driver-side
    sample at ~100k vectors regardless of corpus size."""
    from torchtrajectory_ray.pipelines.build import inputs_fingerprint

    meta_path = os.path.join(out_dir, "meta.json")
    fp = inputs_fingerprint(sorted(input_paths))
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in input_paths)
    auto = nlist is None
    if auto:
        nlist = auto_nlist(n_rows, target_bucket_rows)
    if max_bucket_rows is None:
        max_bucket_rows = 4 * target_bucket_rows
    if sample_mod is None:
        sample_mod = max(1, n_rows // 100_000)
    # every sizing knob is part of the layout identity: different
    # sampling/limits produce different centroids or splits, so any
    # change must invalidate the cache
    params = {
        "id_col": id_col,
        "nlist": nlist,
        "auto": auto,  # whether nlist was derived (rebuilds re-derive)
        "iters": iters,
        "seed": seed,
        "sample_mod": sample_mod,
        "target_bucket_rows": target_bucket_rows,
        "max_bucket_rows": max_bucket_rows,
        # layouts carry int8 codes next to the floats; part of the layout
        # identity so pre-sq8 caches rebuild instead of mixing schemas
        "sq8": True,
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (
            meta.get("inputs_fingerprint") == fp
            and meta.get("params") == params
            and len(meta.get("generations", [fp])) == 1
        ):
            return meta
        shutil.rmtree(out_dir, ignore_errors=True)  # stale layout: rebuild
    elif os.path.isdir(out_dir) and any(
        p.startswith("bucket-") for p in os.listdir(out_dir)
    ):
        # no meta but bucket files exist = a run crashed before its meta
        # write; clear the orphans or they pollute disk/audit stats for
        # every later successful build (correctness was safe — meta lists
        # only its own paths — but the dir would grow without bound)
        shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    ds = ray.data.read_parquet(input_paths, columns=[id_col, "embedding"])

    def sample_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        return batch.filter(pa.array(ids % sample_mod == 0)).select(
            [id_col, "embedding"]
        )

    # the sampling runs distributed; only the SAMPLE reaches the driver,
    # where it is CANONICALIZED by id — Ray block arrival order is not
    # deterministic, and k-means init indexes into the sample matrix, so
    # an unsorted sample would make centroids (and every bucket) vary
    # across reruns
    sample_parts = list(
        ds.map_batches(sample_batch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )
    sample_tbl = (
        pa.concat_tables(sample_parts)
        if sample_parts
        else pa.table(
            {id_col: pa.array([], pa.int64()), "embedding": pa.array([], pa.list_(pa.float32()))}
        )
    )
    if sample_tbl.num_rows == 0:  # empty corpus: valid empty layout
        meta = {
            "params": params,
            "inputs_fingerprint": fp,
            "generations": [_make_generation(input_paths, id_col, fp, 0)],
            "n_vectors": 0,
            "nlist": 0,
            "dim": 0,
            "sample_mod": sample_mod,
            "centroids": [],
            "buckets": {},
            "next_bucket_id": 0,
            "total_bytes": 0,
        }
        _write_meta(out_dir, meta)
        return meta
    order = np.argsort(sample_tbl[id_col].to_numpy().astype(np.int64), kind="stable")
    sample = _batch_matrix(sample_tbl.take(pa.array(order)))
    centroids = _lloyd(sample, nlist, iters=iters, seed=seed)

    partials = (
        ds.map_batches(
            _AssignWrite(out_dir, centroids, id_col),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    buckets: dict[str, dict] = {}
    _merge_partials(
        out_dir, buckets, partials, {b: b for b in range(len(centroids))}
    )
    next_id, to_remove = _split_oversized(
        out_dir,
        centroids,
        buckets,
        len(centroids),
        id_col,
        target_bucket_rows,
        max_bucket_rows,
    )
    stale_files = _compact_buckets(out_dir, buckets)
    n_vectors = int(sum(v["n"] for v in buckets.values()))
    meta = {
        "params": params,
        "inputs_fingerprint": fp,
        "generations": [_make_generation(input_paths, id_col, fp, n_vectors)],
        "n_vectors": n_vectors,
        "nlist": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "sample_mod": sample_mod,
        "centroids": [[float(x) for x in row] for row in centroids],
        "buckets": buckets,
        "next_bucket_id": next_id,
        "total_bytes": int(sum(v["bytes"] for v in buckets.values())),
    }
    _write_meta(out_dir, meta)
    # superseded parent dirs / pre-compaction parts go only AFTER the
    # meta that stopped referencing them is durable (a crash in between
    # leaves a readable layout either way)
    for d in to_remove:
        shutil.rmtree(d, ignore_errors=True)
    for p in stale_files:
        try:
            os.remove(p)
        except OSError:
            pass
    return meta


def extend_ivf(
    input_paths: list[str], out_dir: str, *, allow_id_overlap: bool = False
) -> dict:
    """Generation-append new vectors into an existing layout under the
    FROZEN centroids: one assign pass over only the new inputs, merged
    bucket stats (n, min_cos, paths), oversize splits re-checked, atomic
    meta swap — mirroring ``build.extend_index``'s manifest discipline
    (reference analog: the grid index is rebuild-only, so this exceeds
    parity).  Idempotent per input fingerprint: re-extending with the
    same files is a no-op.

    ``input_paths`` must be the DELTA — only files not already in the
    layout, with ids disjoint from every prior generation.  Passing the
    union (or any id overlap) would silently duplicate vectors, so the
    new ids' [min, max] range (from parquet statistics, no data read) is
    checked against every recorded generation and overlap fails loud;
    ``allow_id_overlap=True`` skips the conservative range check for
    corpora whose disjoint id sets interleave.

    Exact consumers (``neardup_pairs``, full-probe ``probe_topk``) give
    identical answers over extend vs a fresh rebuild of the union;
    partial probes may differ because a rebuild retrains centroids on
    the union's sample."""
    from torchtrajectory_ray.pipelines.build import inputs_fingerprint

    meta_path = os.path.join(out_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    # validate BEFORE any write: a layout from before generation support
    # lacks the split/extend bookkeeping — failing later would leave
    # orphan part files inside live bucket dirs
    if "next_bucket_id" not in meta or "target_bucket_rows" not in meta.get(
        "params", {}
    ):
        raise ValueError(
            "extend_ivf: this layout predates generation support "
            "(meta.json lacks split/extend bookkeeping) — rebuild it "
            "with build_ivf first"
        )
    if not meta["params"].get("sq8"):
        raise ValueError(
            "extend_ivf: this layout predates sq8 codes — appending "
            "would mix part schemas (old parts lack embedding_sq8); "
            "rebuild it with build_ivf first"
        )
    fp_new = inputs_fingerprint(sorted(input_paths))
    gens = meta.get("generations", [meta["inputs_fingerprint"]])
    if fp_new in {_gen_fp(g) for g in gens}:
        return meta  # idempotent re-run of an applied extend: no-op
    deleted = _load_deleted(out_dir)
    if deleted is not None:
        # re-ingesting a tombstoned id would leave the NEW live vector
        # permanently masked (tombstones are global external-id sets) —
        # fail loud: purge first, then extend.  Checked AFTER the
        # fingerprint no-op above so re-submitting a completed extend
        # stays a no-op even once some of its ids are deleted.
        import pyarrow.dataset as pads

        id_col_ = meta["params"]["id_col"]
        clash = (
            pads.dataset(sorted(input_paths), format="parquet")
            .to_table(
                columns=[id_col_],
                filter=pc_field_isin(id_col_, deleted),
            )[id_col_]
            .to_numpy()
        )
        if clash.size:
            raise ValueError(
                f"extend_ivf: {clash.size} new ids are tombstoned "
                f"(e.g. {np.unique(clash)[:5].tolist()}) — the appended "
                "vectors would be masked by the existing tombstones; run "
                "purge_deleted first, then extend"
            )
    id_col = meta["params"]["id_col"]
    n_new = sum(pq.ParquetFile(p).metadata.num_rows for p in input_paths)
    new_rng = _id_range(input_paths, id_col)
    if not allow_id_overlap and new_rng is not None:
        for g in gens:
            if isinstance(g, str) or g.get("id_min") is None or g["n"] == 0:
                continue
            if new_rng[0] <= g["id_max"] and g["id_min"] <= new_rng[1]:
                raise ValueError(
                    f"extend_ivf: new ids [{new_rng[0]}, {new_rng[1]}] "
                    f"overlap generation {g['fp'][:10]}'s range "
                    f"[{g['id_min']}, {g['id_max']}] — pass only NEW files "
                    "(the delta, not the union); duplicated ids would "
                    "corrupt probe results. If the id sets are genuinely "
                    "disjoint but interleaved, pass allow_id_overlap=True."
                )
    new_gen = _make_generation(input_paths, id_col, fp_new, n_new)
    if not meta["centroids"]:
        # gen0 was empty: nothing to freeze — build fresh over the new
        # inputs, then record both generations
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        p = dict(meta["params"])
        built = build_ivf(
            input_paths,
            out_dir,
            id_col=p["id_col"],
            # an auto-sized layout re-derives nlist for the new corpus;
            # params["nlist"] stores the RESOLVED int, so it alone can't
            # signal auto sizing
            nlist=None if p.get("auto") else p["nlist"],
            iters=p["iters"],
            seed=p["seed"],
            target_bucket_rows=p["target_bucket_rows"],
            max_bucket_rows=p["max_bucket_rows"],
        )
        built["generations"] = gens + [new_gen]
        _write_meta(out_dir, built)
        return built
    centroids = np.asarray(meta["centroids"], np.float64)
    new_dim = _embedding_dim(input_paths[0], id_col)
    if new_dim is not None and new_dim != meta["dim"]:
        raise ValueError(
            f"extend_ivf: new vectors have dim {new_dim} but the layout "
            f"was built at dim {meta['dim']} — rebuild instead of extending"
        )
    partials = (
        ray.data.read_parquet(input_paths, columns=[id_col, "embedding"])
        .map_batches(
            _AssignWrite(out_dir, centroids, id_col),
            batch_format="pyarrow",
            batch_size=4096,
        )
        .to_pandas()
    )
    buckets = meta["buckets"]
    # assign writes into bucket id == centroid id; those ids are only
    # ever owned by that centroid (sub-buckets allocate past nlist), so
    # merging by id is unambiguous even after earlier splits
    _merge_partials(
        out_dir, buckets, partials, {b: b for b in range(len(centroids))}
    )
    next_id, to_remove = _split_oversized(
        out_dir,
        centroids,
        buckets,
        max(meta["next_bucket_id"], len(centroids)),
        id_col,
        meta["params"]["target_bucket_rows"],
        meta["params"]["max_bucket_rows"],
    )
    stale_files = _compact_buckets(out_dir, buckets)
    meta.update(
        generations=gens + [new_gen],
        inputs_fingerprint=meta["inputs_fingerprint"],
        n_vectors=int(sum(v["n"] for v in buckets.values())),
        buckets=buckets,
        next_bucket_id=next_id,
        total_bytes=int(sum(v["bytes"] for v in buckets.values())),
    )
    _write_meta(out_dir, meta)
    for d in to_remove:
        shutil.rmtree(d, ignore_errors=True)
    for p in stale_files:
        try:
            os.remove(p)
        except OSError:
            pass
    return meta


def _embedding_dim(path: str, id_col: str) -> int | None:
    """Dim of the first non-empty embedding row (None if the file is
    empty or the column is not fixed-probe-able cheaply)."""
    try:
        f = pq.ParquetFile(path)
        for batch in f.iter_batches(batch_size=64, columns=["embedding"]):
            col = batch.column(0)
            for i in range(len(col)):
                v = col[i].as_py()
                if v is not None:
                    return len(v)
    except Exception:
        return None
    return None


def _bucket_files(out_dir: str, meta: dict, buckets: list[int]) -> list[str]:
    files: list[str] = []
    for b in buckets:
        info = meta["buckets"].get(str(int(b)))
        if info:
            files.extend(os.path.join(out_dir, p) for p in info["paths"])
    return sorted(files)


def _centroid_of(meta: dict) -> dict[int, int]:
    """bucket id → centroid id (pre-split metas map each bucket to
    itself)."""
    return {
        int(b): int(info.get("centroid", int(b)))
        for b, info in meta["buckets"].items()
    }


_PROBE_COLS = ["query_id", "rank", "neighbor_id", "sim"]


def _probe_sets_topk(
    out_dir: str,
    meta: dict,
    query_ids: list[int],
    qn: np.ndarray,
    probe_list: list[np.ndarray],
    k: int,
) -> tuple[pd.DataFrame, dict]:
    """Shared probe executor: read the union of the per-query probe
    sets' buckets (sub-buckets of a probed centroid are all read — they
    partition that centroid's members), per-batch rank-safe partial
    top-k per query (rounded-sim ordering picks, RAW sims returned),
    plus IO stats.  Callers merge the Q × k × n_batches partial rows."""
    cent_of = _centroid_of(meta)
    probed_cents = {int(c) for p in probe_list for c in p}
    probed_buckets = sorted(b for b, c in cent_of.items() if c in probed_cents)
    files = _bucket_files(out_dir, meta, probed_buckets)
    stats = {
        "bytes_read": int(sum(os.path.getsize(p) for p in files)),
        "total_bytes": int(meta["total_bytes"]),
        "n_buckets_probed": len(probed_buckets),
        "nlist": int(meta["nlist"]),
    }
    empty = pd.DataFrame(
        {
            "query_id": np.array([], np.int64),
            "neighbor_id": np.array([], np.int64),
            "sim": np.array([], np.float64),
        }
    )
    if not files:
        return empty, stats
    id_col = meta["params"]["id_col"]
    # vectorized bucket → centroid lookup for the per-batch probe mask
    max_bid = max(cent_of) + 1
    cent_lut = np.full(max_bid, -1, np.int64)
    for b, c in cent_of.items():
        cent_lut[b] = c

    deleted = _load_deleted(out_dir)

    def batch_topk(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        lm = _live_mask(ids, deleted)
        if lm is not None and not lm.all():
            batch = batch.filter(pa.array(lm))
            ids = ids[lm]
        if batch.num_rows == 0:  # fully-tombstoned batch / 0-row file
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        e = _batch_matrix(batch)
        en = _norm_rows(e)
        cents = cent_lut[batch["bucket"].to_numpy().astype(np.int64)]
        sims = qn @ en.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qn)):
            m = np.isin(cents, probe_list[qi])
            if not m.any():
                continue
            s, nid = sims[qi][m], ids[m]
            sel = np.lexsort((nid, -np.round(s, 6)))[: min(k, len(s))]
            out_q.extend([query_ids[qi]] * len(sel))
            out_n.extend(nid[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        ray.data.read_parquet(files, columns=[id_col, "bucket", "embedding"])
        .map_batches(batch_topk, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    if partials.empty:
        return empty, stats
    return partials, stats


def _merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Partial rows → final (query_id, rank, neighbor_id, sim) under the
    6-dp-rounded rank protocol."""
    if partials.empty:
        return pd.DataFrame(columns=_PROBE_COLS)
    partials = partials.copy()
    partials["sim"] = partials["sim"].round(6)
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows(), 1):
            rows.append((int(qid), r, int(row["neighbor_id"]), row["sim"]))
    return pd.DataFrame(rows, columns=_PROBE_COLS)


def probe_topk(
    out_dir: str,
    query_ids: list[int],
    q: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> tuple[pd.DataFrame, dict]:
    """(query_id, rank, neighbor_id, sim) + IO stats.  Each query ranks
    the CENTROIDS and reads only the buckets belonging to its ``nprobe``
    best; each batch restricts each query to its own probe set, takes a
    rank-safe partial top-k (rounded-sim ordering), and the driver
    merges Q × k × n_batches rows."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta["centroids"]:  # empty layout
        return pd.DataFrame(columns=_PROBE_COLS), {
            "bytes_read": 0,
            "total_bytes": 0,
            "n_buckets_probed": 0,
            "nlist": 0,
        }
    C = np.asarray(meta["centroids"], dtype=np.float64)
    qn = _norm_rows(np.asarray(q, dtype=np.float64))
    nprobe = min(nprobe, len(C))
    probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]  # Q × nprobe (centroids)
    partials, stats = _probe_sets_topk(
        out_dir, meta, query_ids, qn, [probe[i] for i in range(len(qn))], k
    )
    return _merge_topk(partials, k), stats


def _centroid_radii(out_dir: str, meta: dict) -> np.ndarray:
    """Per-CENTROID max angular distance (radians) of any member from
    its normalized centroid — the admissible bound state for the exact
    early-terminating probe (the reference's precomputed upper-bound
    cache, ST2 / Yinyang.java:50-120's group bounds, applied to the
    vector layout).  Computed in ONE distributed pass over the layout
    and cached in a sidecar keyed by the meta content: extends and
    compactions change meta (recompute); deletes only shrink the true
    radius, so a stale-by-deletes cache stays admissible."""
    fp = hashlib.md5(
        json.dumps(meta, sort_keys=True).encode()
    ).hexdigest()[:10]
    path = os.path.join(out_dir, f"radii-{fp}.json")
    if os.path.exists(path):
        with open(path) as f:
            return np.asarray(json.load(f)["radii"], dtype=np.float64)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    Cn = _norm_rows(C)
    cent_of = _centroid_of(meta)
    id_col = meta["params"]["id_col"]
    files = _bucket_files(out_dir, meta, sorted(cent_of))
    max_bid = max(cent_of) + 1
    cent_lut = np.full(max_bid, -1, np.int64)
    for b, c in cent_of.items():
        cent_lut[b] = c

    def batch_max(batch: pa.Table) -> pd.DataFrame:
        e = _batch_matrix(batch)
        en = _norm_rows(e)
        cents = cent_lut[batch["bucket"].to_numpy().astype(np.int64)]
        cs = np.einsum("ij,ij->i", en, Cn[cents])
        ang = np.arccos(np.clip(cs, -1.0, 1.0))
        return (
            pd.DataFrame({"c": cents, "ang": ang})
            .groupby("c", as_index=False)
            .max()
        )

    agg = (
        ray.data.read_parquet(files, columns=[id_col, "bucket", "embedding"])
        .map_batches(batch_max, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    radii = np.zeros(len(C), dtype=np.float64)
    if not agg.empty:
        top = agg.groupby("c")["ang"].max()
        radii[top.index.to_numpy().astype(np.int64)] = top.to_numpy()
    with open(path + ".tmp", "w") as f:
        json.dump({"radii": radii.tolist()}, f)
    os.replace(path + ".tmp", path)
    return radii


def probe_topk_exact(
    out_dir: str,
    query_ids: list[int],
    q: np.ndarray,
    *,
    k: int = 10,
    nprobe0: int = 4,
) -> tuple[pd.DataFrame, dict]:
    """EXACT top-k through the IVF layout WITHOUT reading every bucket:
    branch-and-bound probing under an admissible per-centroid bound.

    On the unit sphere θ(q, x) ≥ θ(q, c) − θ(c, x), so every member x of
    centroid c satisfies sim(q, x) ≤ cos(max(0, θ(q, c) − r_c)) with
    r_c the centroid's cached max member angle.  Phase 1 probes the
    ``nprobe0`` best centroids; phase 2 probes only the remaining
    centroids whose bound can still reach the current kth-best raw sim
    (1e-5 slack covers the 6-dp rank rounding and the arccos/cos float
    error), after which every unprobed member provably ranks strictly
    below the kth result — the bruteforce answer at a fraction of the
    IO.  Stats report the pruning and the phase count."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta["centroids"]:
        return pd.DataFrame(columns=_PROBE_COLS), {
            "bytes_read": 0,
            "total_bytes": 0,
            "n_buckets_probed": 0,
            "nlist": 0,
            "exact": True,
            "phases": 0,
        }
    C = np.asarray(meta["centroids"], dtype=np.float64)
    Cn = _norm_rows(C)
    qn = _norm_rows(np.asarray(q, dtype=np.float64))
    radii = _centroid_radii(out_dir, meta)
    csim = qn @ Cn.T  # Q × nlist
    theta = np.arccos(np.clip(csim, -1.0, 1.0))
    bound = np.cos(np.maximum(0.0, theta - radii[None, :]))
    order = np.argsort(-csim, axis=1)
    p0 = min(nprobe0, C.shape[0])
    probe1 = [order[i, :p0] for i in range(len(qn))]
    part1, stats = _probe_sets_topk(out_dir, meta, query_ids, qn, probe1, k)
    SLACK = 1e-5
    tau = {int(qid): -2.0 for qid in query_ids}
    if not part1.empty:
        for qid, g in part1.groupby("query_id"):
            if len(g) >= k:
                tau[int(qid)] = float(g["sim"].nlargest(k).iloc[-1])
    probe2 = []
    for qi in range(len(qn)):
        t = tau[int(query_ids[qi])]
        need = np.flatnonzero(bound[qi] >= t - SLACK)
        probe2.append(np.setdiff1d(need, probe1[qi]))
    stats["phases"] = 1
    parts = [part1]
    if any(len(p) for p in probe2):
        part2, s2 = _probe_sets_topk(out_dir, meta, query_ids, qn, probe2, k)
        parts.append(part2)
        stats["bytes_read"] += s2["bytes_read"]
        stats["n_buckets_probed"] += s2["n_buckets_probed"]
        stats["phases"] = 2
    stats["exact"] = True
    return _merge_topk(pd.concat(parts, ignore_index=True), k), stats


def probe_topk_sq8(
    out_dir: str,
    query_ids: list[int],
    q: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    max_candidates: int = 200_000,
) -> tuple[pd.DataFrame, dict]:
    """:func:`probe_topk` through the int8 codes — the bytes-per-probe
    lever at scale: the scan pass reads ONLY the ``embedding_sq8`` column
    of the probed buckets (~4× fewer bytes than the float column; the
    audit stats report both from parquet column-chunk metadata), then an
    EXACT float rescore reads just the candidates' vectors.

    Results are RANK-IDENTICAL to :func:`probe_topk` at the same probe
    set, guaranteed, not heuristically: with per-component quantization
    error ≤ 0.5/127 the approx dot of a unit query is within
    eps = sqrt(dim)/254 of the true one, so every true top-k member has
    approx score ≥ (k-th best approx) − 2·eps.  The scan emits everything
    above that margin (per batch, against the batch-local k-th — a
    superset of the global cut), the driver applies the global cut, and
    the rescore re-scores those candidates with the float vectors under
    the same rounding + tie-break.  ``max_candidates`` fails loud if the
    margin qualifies an unexpectedly large candidate set (pathologically
    flat similarity spectrum)."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    cols = ["query_id", "rank", "neighbor_id", "sim"]
    empty_stats = {
        "sq8_bytes_read": 0,
        "float_bytes_probed": 0,
        "total_bytes": 0,
        "n_buckets_probed": 0,
        "nlist": 0,
        "n_candidates": 0,
        "margin": 0.0,
    }
    if not meta["centroids"]:
        return pd.DataFrame(columns=cols), empty_stats
    if not meta["params"].get("sq8"):
        raise ValueError(
            "probe_topk_sq8: layout has no embedding_sq8 codes — rebuild "
            "with build_ivf (sq8 layouts are the default)"
        )
    C = np.asarray(meta["centroids"], dtype=np.float64)
    qn = _norm_rows(np.asarray(q, dtype=np.float64))
    nprobe = min(nprobe, len(C))
    probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    cent_of = _centroid_of(meta)
    probed_cents = {int(c) for c in probe.ravel()}
    probed_buckets = sorted(b for b, c in cent_of.items() if c in probed_cents)
    files = _bucket_files(out_dir, meta, probed_buckets)
    id_col = meta["params"]["id_col"]
    margin = 2.0 * _sq8_error_bound(int(meta["dim"]))
    stats = {
        "sq8_bytes_read": _column_bytes(
            files, {id_col, "bucket", "embedding_sq8"}
        ),
        "float_bytes_probed": _column_bytes(
            files, {id_col, "bucket", "embedding"}
        ),
        "total_bytes": int(meta["total_bytes"]),
        "n_buckets_probed": len(probed_buckets),
        "nlist": int(meta["nlist"]),
        "margin": margin,
    }
    if not files:
        stats["n_candidates"] = 0
        return pd.DataFrame(columns=cols), stats
    max_bid = max(cent_of) + 1
    cent_lut = np.full(max_bid, -1, np.int64)
    for b, c in cent_of.items():
        cent_lut[b] = c

    deleted = _load_deleted(out_dir)

    def batch_candidates(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        lm = _live_mask(ids, deleted)
        if lm is not None and not lm.all():
            batch = batch.filter(pa.array(lm))
            ids = ids[lm]
        if batch.num_rows == 0:  # fully-tombstoned batch / 0-row file
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "approx": pa.array([], pa.float64()),
                }
            )
        e = _sq8_matrix(batch)
        cents = cent_lut[batch["bucket"].to_numpy().astype(np.int64)]
        sims = qn @ e.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qn)):
            m = np.isin(cents, probe[qi])
            if not m.any():
                continue
            s, nid = sims[qi][m], ids[m]
            kth = np.partition(s, -min(k, len(s)))[-min(k, len(s))]
            keep = s >= kth - margin
            out_q.extend([query_ids[qi]] * int(keep.sum()))
            out_n.extend(nid[keep].tolist())
            out_s.extend(s[keep].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "approx": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        ray.data.read_parquet(
            files, columns=[id_col, "bucket", "embedding_sq8"]
        )
        .map_batches(batch_candidates, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    if partials.empty:
        stats["n_candidates"] = 0
        return pd.DataFrame(columns=cols), stats
    # global margin cut per query (batch-local cuts were supersets)
    cand: dict[int, np.ndarray] = {}
    for qid, g in partials.groupby("query_id"):
        a = g["approx"].to_numpy()
        a_k = np.partition(a, -min(k, len(a)))[-min(k, len(a))]
        cand[int(qid)] = g["neighbor_id"].to_numpy()[a >= a_k - margin]
    n_cand = int(sum(len(v) for v in cand.values()))
    stats["n_candidates"] = n_cand
    if n_cand > max_candidates:
        raise ValueError(
            f"probe_topk_sq8: margin rescore qualified {n_cand} candidates "
            f"(> max_candidates={max_candidates}) — the similarity spectrum "
            "is too flat for int8 codes at this k; raise max_candidates or "
            "use probe_topk"
        )
    union = np.unique(np.concatenate(list(cand.values())))
    import pyarrow.dataset as pads

    t = pads.dataset(files).to_table(
        columns=[id_col, "embedding"],
        filter=pc_field_isin(id_col, union),
    )
    e = _norm_rows(_batch_matrix(t))
    ids = t[id_col].to_numpy().astype(np.int64)
    sims = np.round(qn @ e.T, 6)
    rows = []
    for qi, qid_ in enumerate(query_ids):
        want = cand.get(int(qid_))
        if want is None:
            continue
        m = np.isin(ids, want)
        s, nid = sims[qi][m], ids[m]
        sel = np.lexsort((nid, -s))[: min(k, len(s))]
        for r, j in enumerate(sel, 1):
            rows.append((int(qid_), r, int(nid[j]), float(s[j])))
    return pd.DataFrame(rows, columns=cols), stats


def range_search(
    out_dir: str,
    query_ids: list[int],
    q: np.ndarray,
    *,
    threshold: float,
) -> tuple[pd.DataFrame, dict]:
    """Radius query (the Faiss ``range_search`` shape): ALL vectors with
    cosine similarity ≥ ``threshold`` to each query — ``(query_id,
    neighbor_id, sim)`` rows + the probe IO stats.

    Bucket pruning is LOSSLESS, the same sphere triangle inequality as
    the bucket-pair near-dup: a member x of bucket b satisfies
    θ(x, c_b) ≤ R_b (R_b from the bucket's stored ``min_cos``), so
    cos(q, x) ≥ t requires θ(q, c_b) ≤ arccos(t) + R_b — only those
    buckets' files are read, every qualifying vector provably lives in
    one of them (exactness vs the brute-force scan is tested).  Each
    batch emits only its ≥-threshold hits, so the driver holds the
    ANSWER, never the scan."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    cols = ["query_id", "neighbor_id", "sim"]
    stats = {
        "bytes_read": 0,
        "total_bytes": int(meta.get("total_bytes", 0)),
        "n_buckets_probed": 0,
        "nlist": int(meta.get("nlist", 0)),
    }
    if not meta["centroids"]:
        return pd.DataFrame(columns=cols), stats
    C = np.asarray(meta["centroids"], dtype=np.float64)
    qn = _norm_rows(np.asarray(q, dtype=np.float64))
    theta_t = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    angles = np.arccos(np.clip(qn @ C.T, -1.0, 1.0))  # Q × ncent
    cent_of = _centroid_of(meta)
    probed_buckets = []
    for b_str, info in meta["buckets"].items():
        b = int(b_str)
        r_b = float(np.arccos(np.clip(info["min_cos"], -1.0, 1.0)))
        if (angles[:, cent_of[b]] <= theta_t + r_b).any():
            probed_buckets.append(b)
    probed_buckets.sort()
    files = _bucket_files(out_dir, meta, probed_buckets)
    stats["bytes_read"] = int(sum(os.path.getsize(p) for p in files))
    stats["n_buckets_probed"] = len(probed_buckets)
    if not files:
        return pd.DataFrame(columns=cols), stats
    id_col = meta["params"]["id_col"]
    deleted = _load_deleted(out_dir)
    qids = np.asarray(query_ids, np.int64)

    def batch_hits(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        lm = _live_mask(ids, deleted)
        if lm is not None and not lm.all():
            batch = batch.filter(pa.array(lm))
            ids = ids[lm]
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        e = _norm_rows(_batch_matrix(batch))
        sims = qn @ e.T  # Q × B cosine (both sides unit)
        qi, bi = np.nonzero(sims >= threshold)
        return pa.table(
            {
                "query_id": pa.array(qids[qi], pa.int64()),
                "neighbor_id": pa.array(ids[bi], pa.int64()),
                "sim": pa.array(sims[qi, bi], pa.float64()),
            }
        )

    out = (
        ray.data.read_parquet(files, columns=[id_col, "embedding"])
        .map_batches(batch_hits, batch_format="pyarrow")
        .to_pandas()
    )
    out["sim"] = out["sim"].round(6)
    out = out.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    return out, stats


def pc_field_isin(col: str, values: np.ndarray):
    import pyarrow.dataset as pads

    return pads.field(col).isin(pa.array(values, pa.int64()))


# --- vector tombstones (the text index's delete_docs, mirrored) ---------------


def _tombstone_path(out_dir: str) -> str:
    return os.path.join(out_dir, "tombstones.json")


def _load_deleted(out_dir: str) -> np.ndarray | None:
    """Sorted tombstoned vector ids, or None.  Small enough to ride into
    task closures at takedown scale; a corpus-fraction delete set should
    be a purge instead (purge_deleted)."""
    p = _tombstone_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        arr = np.asarray(json.load(f)["ids"], dtype=np.int64)
    return arr if arr.size else None


def _live_mask(ids: np.ndarray, deleted: np.ndarray | None) -> np.ndarray | None:
    """Boolean keep-mask against the sorted tombstone set (None = all
    live — callers skip the indexing work entirely)."""
    if deleted is None:
        return None
    pos = np.clip(np.searchsorted(deleted, ids), 0, len(deleted) - 1)
    return deleted[pos] != ids


def delete_vectors(out_dir: str, ids) -> dict:
    """Tombstone vectors in an IVF layout (the text index's
    ``delete_docs`` mirrored): bucket files stay immutable; every probe
    path (driver, sq8, Dataset-batch, bucket-pair near-dup) masks the
    set; ``purge_deleted`` rewrites buckets physically.  Unknown ids
    fail loud; re-deletes are idempotent; writes are atomic."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    req = np.unique(np.asarray(list(ids), dtype=np.int64))
    if req.size == 0:
        raise ValueError("delete_vectors: empty ids")
    id_col = meta["params"]["id_col"]
    all_buckets = sorted(int(b) for b in meta["buckets"])
    files = _bucket_files(out_dir, meta, all_buckets)
    import pyarrow.dataset as pads

    found = (
        pads.dataset(files, format="parquet")
        .to_table(columns=[id_col], filter=pc_field_isin(id_col, req))[id_col]
        .to_numpy()
        .astype(np.int64)
        if files
        else np.empty(0, np.int64)
    )
    missing = np.setdiff1d(req, found)
    if missing.size:
        raise ValueError(
            f"delete_vectors: {missing.size} ids not in this layout "
            f"(e.g. {missing[:5].tolist()})"
        )
    existing = _load_deleted(out_dir)
    merged = (
        np.union1d(existing, req) if existing is not None else req
    )
    tmp = _tombstone_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"ids": [int(d) for d in merged], "n_deleted": int(merged.size)}, f
        )
    os.replace(tmp, _tombstone_path(out_dir))
    n_existing = int(existing.size) if existing is not None else 0
    return {
        "n_requested": int(req.size),
        "n_new": int(merged.size) - n_existing,
        "n_deleted_total": int(merged.size),
    }


def purge_deleted(out_dir: str) -> dict:
    """Make the tombstones physical: rewrite every bucket that holds a
    deleted vector into one id-sorted file without them (distributed,
    one task per bucket batch — the same discipline as bucket
    compaction: new files first, meta swap, old files deleted last, so a
    crash at any point leaves a readable layout).  Bucket ``min_cos``
    is kept (removing members can only tighten the spread, so the
    triangle-inequality prune stays valid)."""
    from torchtrajectory_ray.pipelines.build import inputs_fingerprint

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    deleted = _load_deleted(out_dir)
    if deleted is None:
        return {"n_purged": 0, "n_buckets_rewritten": 0}
    id_col = meta["params"]["id_col"]
    buckets = meta["buckets"]
    paths_of = {
        int(b): [os.path.join(out_dir, p) for p in v["paths"]]
        for b, v in buckets.items()
    }

    def rewrite(batch: pa.Table) -> pa.Table:
        rows = []
        for b in batch["bucket"].to_pylist():
            t = pq.read_table(paths_of[int(b)])
            ids = t[id_col].to_numpy().astype(np.int64)
            lm = _live_mask(ids, deleted)
            if lm.all():
                continue  # no victim in this bucket: untouched
            t = t.filter(pa.array(lm))
            ids = ids[lm]
            order = np.argsort(ids, kind="stable")
            t = t.take(pa.array(order))
            name = f"bucket-{int(b):05d}/purged-{inputs_fingerprint(sorted(paths_of[int(b)]))[:12]}.parquet"
            dst = os.path.join(out_dir, name)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            pq.write_table(t, dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            rows.append(
                {"bucket": int(b), "path": name, "n": int(t.num_rows)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("bucket", pa.int64()), ("path", pa.string()), ("n", pa.int64())]
            ),
        )

    work = pa.table(
        {"bucket": pa.array(sorted(paths_of), pa.int64())}
    )
    res = (
        ray.data.from_arrow(work)
        .repartition(max(1, min(len(paths_of), 32)))
        .map_batches(rewrite, batch_format="pyarrow", batch_size=8)
        .to_pandas()
    )
    n_purged = 0
    old_files: list[str] = []
    for _, row in res.iterrows():
        key = str(int(row["bucket"]))
        info = buckets[key]
        n_purged += info["n"] - int(row["n"])
        old_files.extend(os.path.join(out_dir, p) for p in info["paths"])
        info["n"] = int(row["n"])
        info["paths"] = [row["path"]]
        info["bytes"] = int(
            os.path.getsize(os.path.join(out_dir, row["path"]))
        )
    meta["total_bytes"] = int(sum(v["bytes"] for v in buckets.values()))
    meta["n_vectors"] = int(sum(v["n"] for v in buckets.values()))
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    os.remove(_tombstone_path(out_dir))  # now physical
    for p in old_files:  # safe: meta no longer references them
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
    return {
        "n_purged": int(n_purged),
        "n_buckets_rewritten": int(len(res)),
    }


def probe_topk_ds(
    out_dir: str,
    queries,
    *,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "query_id",
    query_salt: int = 1,
):
    """Dataset-native BATCH form of :meth:`probe_topk` for large query
    workloads (the driver-side form holds the whole Q × dim matrix and
    every partial row; this one streams).  Returns a Dataset of
    (query_id, rank, neighbor_id, sim) with the same rounding and
    tie-break as ``probe_topk``, so results are rank-identical for the
    same probe set (tested).

    Shape: queries are routed TO their data —

    1. one ``map_batches`` pass ranks centroids per query and emits
       (centroid, query_id, embedding) rows, nprobe per query;
    2. ``groupby(centroid).map_groups`` loads that centroid's bucket
       files ONE FILE AT A TIME, keeping a running per-query top-k
       (memory = group's queries × k + one file, never the centroid's
       whole population);
    3. ``groupby(query_id).map_groups`` merges the ≤ nprobe partial
       top-k lists per query.

    Two bounded shuffles, no driver materialization — the batch-serving
    analog of the reference's QueryPool fan-out.

    Per-task memory in stage 2 is that group's queries × dim.  A query
    workload concentrated on FEW centroids puts most queries in one
    group; ``query_salt=S`` splits every centroid's queries across S
    groups (group key becomes (centroid, id-hash % S)), bounding task
    memory at the price of re-reading the centroid's files S times —
    set S ≈ ceil(expected_queries_per_hot_centroid / memory_budget)."""
    import ray.data as _rd

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta["centroids"]:
        return _rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        )
    C = np.asarray(meta["centroids"], np.float64)
    nprobe = min(nprobe, len(C))
    S = max(1, int(query_salt))
    vec_col = meta["params"]["id_col"]
    deleted = _load_deleted(out_dir)
    cent_files: dict[int, list[str]] = {}
    for b, cid in _centroid_of(meta).items():
        cent_files.setdefault(cid, []).extend(
            os.path.join(out_dir, p)
            for p in meta["buckets"][str(b)]["paths"]
        )

    def route(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "group": pa.array([], pa.int64()),
                    "query_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], batch.schema.field("embedding").type)
                    if "embedding" in batch.schema.names
                    else pa.array([], pa.list_(pa.float32())),
                }
            )
        qn = _norm_rows(_batch_matrix(batch))
        probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]  # B × nprobe
        B = batch.num_rows
        idx = np.repeat(np.arange(B), nprobe)
        # group = centroid × S + id-hash salt; the centroid is recovered
        # as group // S downstream — one key column through the shuffle
        group = probe.ravel().astype(np.int64) * S
        if S > 1:
            qids = batch[id_col].to_numpy().astype(np.int64)
            group += (
                ((qids[idx].astype(np.uint64) * _MIX) >> np.uint64(32))
                % np.uint64(S)
            ).astype(np.int64)
        return pa.table(
            {
                "group": pa.array(group),
                "query_id": batch[id_col].take(pa.array(idx)),
                "embedding": batch["embedding"].take(pa.array(idx)),
            }
        )

    def score_centroid_group(g: pd.DataFrame) -> pd.DataFrame:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        if len(g) == 0:
            return pd.DataFrame(
                columns=["query_id", "neighbor_id", "sim"]
            ).astype({"query_id": "int64", "neighbor_id": "int64", "sim": "float64"})
        cid = int(g["group"].iloc[0]) // S
        q = _norm_rows(
            np.asarray([np.asarray(v, np.float64) for v in g["embedding"]])
        )
        qids = g["query_id"].to_numpy().astype(np.int64)
        # running per-query top-k across this centroid's files — one
        # file resident at a time
        best_s = [np.empty(0, np.float64) for _ in qids]
        best_n = [np.empty(0, np.int64) for _ in qids]
        for path in cent_files.get(cid, ()):
            t = pq.read_table(path, columns=[vec_col, "embedding"])
            if t.num_rows == 0:
                continue
            ids = t[vec_col].to_numpy().astype(np.int64)
            lm = _live_mask(ids, deleted)
            if lm is not None and not lm.all():
                t = t.filter(pa.array(lm))
                ids = ids[lm]
                if t.num_rows == 0:
                    continue
            e = _norm_rows(_batch_matrix(t))
            sims = q @ e.T
            for qi in range(len(qids)):
                s = np.concatenate([best_s[qi], sims[qi]])
                n = np.concatenate([best_n[qi], ids])
                sel = np.lexsort((n, -np.round(s, 6)))[: min(k, len(s))]
                best_s[qi], best_n[qi] = s[sel], n[sel]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(qids)):
            rows_q.extend([qids[qi]] * len(best_n[qi]))
            rows_n.extend(best_n[qi].tolist())
            rows_s.extend(best_s[qi].tolist())
        return pd.DataFrame(
            {"query_id": rows_q, "neighbor_id": rows_n, "sim": rows_s}
        )

    def merge_query_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                columns=["query_id", "rank", "neighbor_id", "sim"]
            )
        g = g.copy()
        g["sim"] = g["sim"].round(6)
        # a neighbor can appear once per probed centroid only if bucket
        # sets overlapped — they partition, so no dedup needed
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "sim"]].reset_index(
            drop=True
        )

    return (
        queries.map_batches(route, batch_format="pyarrow")
        .groupby("group")
        .map_groups(score_centroid_group, batch_format="pandas")
        .groupby("query_id")
        .map_groups(merge_query_group, batch_format="pandas")
    )


class _PairTask:
    """map_batches task over bucket-pair work items: reads the two
    buckets' files (two-bucket memory bound — the oversize split keeps a
    bucket ≤ max_bucket_rows, so this never approaches corpus size),
    computes the cross cosine block in chunks, emits (a, b, sim) pairs ≥
    threshold with a < b.  Buckets partition the vectors, so every
    qualifying pair is computed in exactly ONE surviving bucket-pair
    task.

    ``max_pairs`` bounds the pairs emitted by THE WHOLE TASK (the counter
    spans all its bucket pairs) — a loud guard against ill-posed queries
    where a meaningful fraction of ALL pairs qualifies and the ANSWER
    itself is quadratic (e.g. near-identical short docs under a coarse
    hashing embedding); such a run fails fast with guidance instead of
    grinding through an output nobody can hold."""

    def __init__(
        self, out_dir: str, meta: dict, threshold: float, max_pairs: int
    ):
        self.out_dir = out_dir
        self.meta = meta
        self.threshold = threshold
        self.max_pairs = max_pairs
        self.id_col = meta["params"]["id_col"]
        self.deleted = _load_deleted(out_dir)  # tombstoned vectors
        self._cache: dict[int, tuple] = {}

    def _load(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(b)
        if hit is not None:
            self._cache[b] = self._cache.pop(b)  # refresh LRU position
            return hit
        files = _bucket_files(self.out_dir, self.meta, [b])
        t = pq.read_table(files, columns=[self.id_col, "embedding"])
        ids = t[self.id_col].to_numpy().astype(np.int64)
        lm = _live_mask(ids, self.deleted)
        if lm is not None and not lm.all():
            t = t.filter(pa.array(lm))
            ids = ids[lm]
        if t.num_rows == 0:  # fully-tombstoned / purged-empty bucket
            e = np.zeros((0, int(self.meta["dim"])), np.float64)
        else:
            e = _batch_matrix(t)
        while len(self._cache) >= 3:  # evict LRU only — clearing all
            # would reload the batch's shared b1 on every other pair
            self._cache.pop(next(iter(self._cache)))
        self._cache[b] = (ids, e)
        return ids, e

    def __call__(self, batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        out_a, out_b, out_s = [], [], []
        n_emitted = 0  # bounds the TASK: spans every bucket pair below
        for b1, b2 in zip(
            batch["b1"].to_pylist(), batch["b2"].to_pylist()
        ):
            ia, ea = self._load(int(b1))
            ib, eb = self._load(int(b2))
            na = _norm_rows(ea)
            nb = _norm_rows(eb)
            CH = 2048
            for c0 in range(0, len(ia), CH):
                c1 = min(c0 + CH, len(ia))
                sims = na[c0:c1] @ nb.T
                r, c = np.nonzero(sims >= self.threshold)
                a_ids, b_ids = ia[c0:c1][r], ib[c]
                keep = a_ids != b_ids if b1 == b2 else np.ones(len(r), bool)
                a_ids, b_ids, sv = a_ids[keep], b_ids[keep], sims[r, c][keep]
                lo = np.minimum(a_ids, b_ids)
                hi = np.maximum(a_ids, b_ids)
                if b1 == b2:
                    # full symmetric matrix: keep one orientation only
                    keep2 = a_ids < b_ids
                    lo, hi, sv = lo[keep2], hi[keep2], sv[keep2]
                n_emitted += len(lo)
                if n_emitted > self.max_pairs:
                    raise ValueError(
                        f"near-dup output exceeded max_pairs={self.max_pairs} "
                        f"in one bucket-pair task (threshold {self.threshold} "
                        "qualifies a large fraction of ALL pairs on this "
                        "corpus — the answer itself is quadratic). Raise the "
                        "threshold, or raise max_pairs if the output volume "
                        "is intended."
                    )
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(sv)
        cat = (
            lambda parts, dt: np.concatenate(parts)
            if parts
            else np.empty(0, dt)
        )
        out_a = cat(out_a, np.int64)
        out_b = cat(out_b, np.int64)
        out_s = cat(out_s, np.float64)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def neardup_pairs_ds(
    out_dir: str,
    threshold: float,
    *,
    names: tuple[str, str] = ("vec_a", "vec_b"),
    max_pairs_per_task: int = 5_000_000,
):
    """Exact cosine pairs ≥ threshold over the bucketed layout as a
    STREAMING Dataset (None when nothing survives pruning) + prune
    stats.  Consume with ``write_parquet`` / ``iter_batches`` when the
    answer itself is large — only :func:`neardup_pairs` collects to the
    driver.  Bucket-pair (i, j) survives iff the minimum possible angle
    between members, θ(c_i,c_j) − R_i − R_j, is ≤ arccos(threshold)
    (triangle inequality on the sphere ⇒ no false negatives; a small
    radian slack guards float32 storage noise).  Sub-buckets carry their
    parent centroid and their OWN (tighter) radius.
    ``max_pairs_per_task`` bounds the emitted pairs of each task (all its
    bucket pairs combined)."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta["centroids"]:  # empty layout
        return (
            None,
            {"n_bucket_pairs": 0, "n_pruned": 0, "nlist": 0, "n_buckets": 0},
        )
    C = np.asarray(meta["centroids"], dtype=np.float64)
    cent_of = _centroid_of(meta)
    live = np.array(sorted(cent_of), np.int64)
    Bc = C[[cent_of[int(b)] for b in live]]  # per-bucket centroid rows
    R = np.array(
        [
            float(
                np.arccos(
                    np.clip(meta["buckets"][str(b)]["min_cos"], -1.0, 1.0)
                )
            )
            for b in live
        ]
    )
    alpha = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    # the prune grid is evaluated in ROW CHUNKS — the full nb × nb theta
    # matrix is O(nlist²) driver memory (tens of GB at nlist=65536), but
    # a chunk × nb strip is bounded; survivors stream into id arrays
    nb = len(live)
    ch = max(16, 8_000_000 // max(1, nb))
    surv_a, surv_b = [], []
    for c0 in range(0, nb, ch):
        c1 = min(c0 + ch, nb)
        theta = np.arccos(np.clip(Bc[c0:c1] @ Bc.T, -1.0, 1.0))
        ok = theta - R[c0:c1, None] - R[None, :] <= alpha + 1e-6
        # upper triangle only: global row index ≤ column index
        ok &= np.arange(c0, c1)[:, None] <= np.arange(nb)[None, :]
        r, c = np.nonzero(ok)
        surv_a.append(live[r + c0])
        surv_b.append(live[c])
    b1 = np.concatenate(surv_a) if surv_a else np.empty(0, np.int64)
    b2 = np.concatenate(surv_b) if surv_b else np.empty(0, np.int64)
    n_total = nb * (nb + 1) // 2  # upper triangle incl. diagonal
    stats = {
        "n_bucket_pairs": n_total,
        "n_pruned": n_total - len(b1),
        "nlist": int(meta["nlist"]),
        "n_buckets": nb,
    }
    if not len(b1):
        return None, stats
    # a few bucket pairs per task: the per-task bucket cache makes
    # consecutive pairs sharing a bucket reuse its decoded matrix, and
    # ~64 tasks amortize Ray task overhead without hurting parallelism.
    # from_arrow yields ONE block — repartition, or every pair runs in
    # a single serial task (parallelism comes from blocks, not batches)
    n_tasks = min(64, len(b1))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                names[0]: batch["id_a"],
                names[1]: batch["id_b"],
                "sim": pc.round(batch["sim"], ndigits=6),
            }
        )

    ds = (
        ray.data.from_arrow(
            pa.table({"b1": pa.array(b1), "b2": pa.array(b2)})
        )
        .repartition(n_tasks)
        .map_batches(
            _PairTask(out_dir, meta, threshold, max_pairs_per_task),
            batch_format="pyarrow",
            batch_size=max(1, -(-len(b1) // n_tasks)),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
    return ds, stats


def neardup_pairs(
    out_dir: str,
    threshold: float,
    *,
    names: tuple[str, str] = ("vec_a", "vec_b"),
    max_pairs_per_task: int = 5_000_000,
) -> tuple[pd.DataFrame, dict]:
    """Driver-collected form of :func:`neardup_pairs_ds`: the pair
    Dataset gathered to a (sorted) DataFrame.  ``max_pairs_per_task``
    bounds each task's output; answers too large for the driver should
    consume :func:`neardup_pairs_ds` directly (write_parquet /
    iter_batches) instead."""
    ds, stats = neardup_pairs_ds(
        out_dir,
        threshold,
        names=names,
        max_pairs_per_task=max_pairs_per_task,
    )
    cols = [names[0], names[1], "sim"]
    if ds is None:
        return pd.DataFrame(columns=cols), stats
    out = ds.to_pandas()
    if out.empty:
        return pd.DataFrame(columns=cols), stats
    return (
        out.sort_values([names[0], names[1]]).reset_index(drop=True)[cols],
        stats,
    )


def compact_ivf(
    out_dir: str,
    new_dir: str,
    *,
    nlist: int | None = None,
    target_bucket_rows: int | None = None,
) -> dict:
    """Retraining compaction — the vector layout's analog of the text
    index's :func:`build.compact_index`: rebuild ``out_dir`` into a
    FRESH layout at ``new_dir`` from its own bucket files, retraining
    centroids on the (live) corpus and re-deriving ``nlist``, which
    removes the assignment drift that generation appends accumulate
    under frozen centroids.  Tombstoned vectors are dropped during the
    staging pass, so the purge is folded in.

    Exact consumers (full-probe ``probe_topk``, ``neardup_pairs``) give
    identical answers over the compacted layout; partial probes may
    differ (better, typically) because the centroids are retrained.

    The staging pass is a distributed projected read → parquet rewrite
    (one stream, no driver materialization); the rebuild is the ordinary
    resumable :func:`build_ivf`."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if os.path.realpath(out_dir) == os.path.realpath(new_dir):
        raise ValueError(
            "compact_ivf needs a fresh new_dir — in-place compaction "
            "would interleave retrained buckets with the source's"
        )
    id_col = meta["params"]["id_col"]
    all_buckets = sorted(int(b) for b in meta["buckets"])
    files = _bucket_files(out_dir, meta, all_buckets)
    if not files:
        raise ValueError("compact_ivf: source layout has no bucket files")
    deleted = _load_deleted(out_dir)
    # the staging dir lives OUTSIDE new_dir (build_ivf rmtree's new_dir
    # on a stale-layout cache miss — staging inside it would destroy the
    # rebuild's own inputs) and is keyed by the SOURCE STATE (meta +
    # tombstones), so a re-compact after further deletes/extends
    # restages instead of silently serving the stale compaction
    with open(os.path.join(out_dir, "meta.json"), "rb") as f:
        state = hashlib.sha1(f.read())
    if deleted is not None:
        state.update(deleted.tobytes())
    fp = state.hexdigest()[:12]
    new_abs = os.path.abspath(new_dir).rstrip(os.sep)
    stage_dir = f"{new_abs}-compact-input-{fp}"
    marker = os.path.join(stage_dir, "_STAGED")
    if not os.path.exists(marker):
        # a missing marker means no staging or a CRASHED one — clear
        # partial leftovers or write_parquet would append a second
        # UUID-named file set and silently duplicate vectors
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.makedirs(stage_dir, exist_ok=True)

        def live_rows(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy().astype(np.int64)
            lm = _live_mask(ids, deleted)
            if lm is not None and not lm.all():
                batch = batch.filter(pa.array(lm))
            return batch

        (
            ray.data.read_parquet(files, columns=[id_col, "embedding"])
            .map_batches(live_rows, batch_format="pyarrow")
            .write_parquet(stage_dir)
        )
        with open(marker, "w") as f:
            f.write("ok")
    staged = sorted(
        os.path.join(stage_dir, p)
        for p in os.listdir(stage_dir)
        if p.endswith(".parquet")
    )
    if not staged:
        raise ValueError(
            "compact_ivf: every vector of the source layout is "
            "tombstoned — compacting to an empty layout is almost "
            "certainly an error (delete the layout instead)"
        )
    return build_ivf(
        staged,
        new_dir,
        id_col=id_col,
        nlist=nlist,
        target_bucket_rows=(
            target_bucket_rows
            if target_bucket_rows is not None
            else meta["params"]["target_bucket_rows"]
        ),
    )


def cached_ivf_dir(
    input_paths: list[str],
    *,
    id_col: str,
    nlist: int | None,
    label: str,
    target_bucket_rows: int = TARGET_BUCKET_ROWS,
) -> str:
    """Deterministic /tmp cache location for an IVF layout over the given
    inputs (same identity discipline as corpus.documents_index).
    ``nlist=None`` (auto-sizing) is part of the identity, as is the
    bucket-size target it derives from."""
    sig = []
    for p in sorted(input_paths):
        st = os.stat(p)
        sig.append([os.path.abspath(p), st.st_size, st.st_mtime_ns])
    tag = hashlib.md5(
        json.dumps(
            [sig, id_col, nlist, target_bucket_rows], sort_keys=True
        ).encode()
    ).hexdigest()[:10]
    d = os.path.join(CACHE_ROOT, f"ivf-{label}-{nlist or 'auto'}-{tag}")
    os.makedirs(d, exist_ok=True)
    return d
