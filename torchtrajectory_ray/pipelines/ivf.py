"""Bucket-partitioned IVF index over an embedding column — the scale
path for similarity search AND embedding near-dup.

Structural analog of the reference's grid index + candidate ring probe
(/root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/spatialIndex/
LEVI.java:95-112 — bound candidates by geometry, exact-score only the
candidates), re-expressed for the cosine sphere:

- **build**: centroids trained on a DISTRIBUTED deterministic sample
  (hash-mod inside ``map_batches`` — the driver only ever holds the
  small sample and the nlist×dim centroid matrix), then one assign pass
  writes vectors into ``bucket-NNNN/`` parquet directories (one file per
  input block, content-addressed + atomic ⇒ resumable).  Per-bucket
  metadata records the bucket's angular RADIUS (max angle member↔
  centroid) — the exactness lever below.
- **probe** (``probe_topk``): queries read ONLY their ``nprobe``
  buckets' files — real IO pruning (directory selection), not a
  scan-and-mask.  Bytes touched vs total are reported for audit.
- **near-dup** (``neardup_pairs``): exact all-pairs ≥ threshold without
  any full-matrix broadcast.  Buckets partition the vectors, tasks work
  on bucket PAIRS, and the triangle inequality on the sphere prunes
  pairs that cannot contain a qualifying vector pair:

      θ(a,b) ≤ α  ⇒  θ(c_a,c_b) ≤ R_a + α + R_b

  so a bucket pair with θ(c_i,c_j) − R_i − R_j > α is skipped with NO
  false negatives.  High thresholds (real near-dup territory) prune most
  of the grid; at a permissive threshold it degrades gracefully into a
  distributed block-pair join — still exact, still O(bucket) memory per
  task, never O(n) driver state.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

CACHE_ROOT = "/tmp/ttray_cache"


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


def _lloyd(sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Seeded spherical k-means on the (small) sample matrix; returns
    unit-norm centroids.  Empty clusters keep their previous centroid."""
    s = _norm_rows(sample)
    nlist = min(nlist, len(s))
    rng = np.random.default_rng(seed)
    c = s[rng.choice(len(s), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(c @ s.T, axis=0)
        for j in range(nlist):
            m = assign == j
            if m.any():
                c[j] = s[m].mean(axis=0)
        c = _norm_rows(c)
    return c


class _AssignWrite:
    """map_batches task: batch → per-bucket parquet appends under
    ``out_dir/bucket-NNNN/``; returns one partial row per touched bucket
    (n, min_cos member↔centroid, file path, bytes).  File names are
    content-addressed (hash of the batch's ids) and written atomically,
    so task retries and reruns are idempotent."""

    def __init__(self, out_dir: str, centroids: np.ndarray, id_col: str):
        self.out_dir = out_dir
        self.c = centroids
        self.id_col = id_col

    _PARTIAL_SCHEMA = pa.schema(
        [
            ("bucket", pa.int64()),
            ("n", pa.int64()),
            ("min_cos", pa.float64()),
            ("path", pa.string()),
            ("bytes", pa.int64()),
        ]
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        if batch.num_rows == 0:  # 0-row input shards are legal
            return self._PARTIAL_SCHEMA.empty_table()
        e = _norm_rows(_batch_matrix(batch))
        ids = batch[self.id_col].to_numpy().astype(np.int64)
        sims = self.c @ e.T  # nlist × B
        assign = np.argmax(sims, axis=0).astype(np.int32)
        best = sims[assign, np.arange(len(ids))]
        rows = []
        for b in np.unique(assign):
            m = assign == b
            bdir = os.path.join(self.out_dir, f"bucket-{b:05d}")
            os.makedirs(bdir, exist_ok=True)
            tag = hashlib.blake2b(
                ids[m].tobytes(), digest_size=6
            ).hexdigest()
            path = os.path.join(bdir, f"part-{tag}.parquet")
            if not os.path.exists(path):
                sub = batch.filter(pa.array(m)).append_column(
                    "bucket", pa.array(np.full(int(m.sum()), b, np.int32))
                )
                pq.write_table(sub, path + ".tmp")
                os.replace(path + ".tmp", path)
            rows.append(
                {
                    "bucket": int(b),
                    "n": int(m.sum()),
                    "min_cos": float(best[m].min()),
                    "path": os.path.relpath(path, self.out_dir),
                    "bytes": os.path.getsize(path),
                }
            )
        return pa.Table.from_pylist(rows)


def build_ivf(
    input_paths: list[str],
    out_dir: str,
    *,
    id_col: str = "vec_id",
    nlist: int = 16,
    sample_mod: int | None = None,
    iters: int = 10,
    seed: int = 42,
) -> dict:
    """Build (or reuse) the bucket-partitioned layout; returns the meta
    dict.  ``sample_mod``: train centroids on ids with id % mod == 0
    (deterministic distributed sample); default caps the driver-side
    sample at ~100k vectors regardless of corpus size."""
    from torchtrajectory_ray.pipelines.build import inputs_fingerprint

    meta_path = os.path.join(out_dir, "meta.json")
    fp = inputs_fingerprint(sorted(input_paths))
    n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in input_paths)
    if sample_mod is None:
        sample_mod = max(1, n_rows // 100_000)
    # sample_mod is part of the layout identity: a different sampling
    # trains different centroids, so it must invalidate the cache
    params = {
        "id_col": id_col,
        "nlist": nlist,
        "iters": iters,
        "seed": seed,
        "sample_mod": sample_mod,
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("inputs_fingerprint") == fp and meta.get("params") == params:
            return meta
        shutil.rmtree(out_dir, ignore_errors=True)  # stale layout: rebuild
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
            "n_vectors": 0,
            "nlist": 0,
            "dim": 0,
            "sample_mod": sample_mod,
            "centroids": [],
            "buckets": {},
            "total_bytes": 0,
        }
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(meta_path + ".tmp", meta_path)
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
    for b, g in (partials.groupby("bucket") if len(partials) else ()):
        buckets[str(int(b))] = {
            "n": int(g["n"].sum()),
            "min_cos": float(g["min_cos"].min()),
            "paths": sorted(set(g["path"])),
            "bytes": int(
                sum(
                    os.path.getsize(os.path.join(out_dir, p))
                    for p in set(g["path"])
                )
            ),
        }
    meta = {
        "params": params,
        "inputs_fingerprint": fp,
        "n_vectors": int(partials["n"].sum()),
        "nlist": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "sample_mod": sample_mod,
        "centroids": [[float(x) for x in row] for row in centroids],
        "buckets": buckets,
        "total_bytes": int(sum(v["bytes"] for v in buckets.values())),
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return meta


def _bucket_files(out_dir: str, meta: dict, buckets: list[int]) -> list[str]:
    files: list[str] = []
    for b in buckets:
        info = meta["buckets"].get(str(int(b)))
        if info:
            files.extend(os.path.join(out_dir, p) for p in info["paths"])
    return sorted(files)


def probe_topk(
    out_dir: str,
    query_ids: list[int],
    q: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> tuple[pd.DataFrame, dict]:
    """(query_id, rank, neighbor_id, sim) + IO stats.  Reads ONLY the
    probed buckets' files; each batch restricts each query to its own
    probe set, takes a rank-safe partial top-k (rounded-sim ordering),
    and the driver merges Q × k × n_batches rows."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    cols = ["query_id", "rank", "neighbor_id", "sim"]
    if not meta["centroids"]:  # empty layout
        return pd.DataFrame(columns=cols), {
            "bytes_read": 0,
            "total_bytes": 0,
            "n_buckets_probed": 0,
            "nlist": 0,
        }
    C = np.asarray(meta["centroids"], dtype=np.float64)
    qn = _norm_rows(np.asarray(q, dtype=np.float64))
    nprobe = min(nprobe, len(C))
    probe = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]  # Q × nprobe
    files = _bucket_files(out_dir, meta, sorted({int(b) for b in probe.ravel()}))
    stats = {
        "bytes_read": int(sum(os.path.getsize(p) for p in files)),
        "total_bytes": int(meta["total_bytes"]),
        "n_buckets_probed": len({int(b) for b in probe.ravel()}),
        "nlist": int(meta["nlist"]),
    }
    if not files:
        return pd.DataFrame(columns=cols), stats
    id_col = meta["params"]["id_col"]

    def batch_topk(batch: pa.Table) -> pa.Table:
        e = _batch_matrix(batch)
        en = _norm_rows(e)
        ids = batch[id_col].to_numpy().astype(np.int64)
        bks = batch["bucket"].to_numpy().astype(np.int64)
        sims = qn @ en.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qn)):
            m = np.isin(bks, probe[qi])
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
        return pd.DataFrame(columns=cols), stats
    partials["sim"] = partials["sim"].round(6)
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows(), 1):
            rows.append((int(qid), r, int(row["neighbor_id"]), row["sim"]))
    return pd.DataFrame(rows, columns=cols), stats


class _PairTask:
    """map_batches task over bucket-pair work items: reads the two
    buckets' files (two-bucket memory bound — never the corpus), computes
    the cross cosine block in chunks, emits (a, b, sim) pairs ≥ threshold
    with a < b.  Buckets partition the vectors, so every qualifying pair
    is computed in exactly ONE surviving bucket-pair task.

    ``max_pairs``: loud guard against ill-posed queries — a threshold at
    which a meaningful fraction of ALL pairs qualifies makes the ANSWER
    itself quadratic (e.g. near-identical short docs under a coarse
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
        self._cache: dict[int, tuple] = {}

    def _load(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        files = _bucket_files(self.out_dir, self.meta, [b])
        t = pq.read_table(files, columns=[self.id_col, "embedding"])
        ids = t[self.id_col].to_numpy().astype(np.int64)
        e = _batch_matrix(t)
        if len(self._cache) >= 3:
            self._cache.clear()
        self._cache[b] = (ids, e)
        return ids, e

    def __call__(self, batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        out_a, out_b, out_s = [], [], []
        for b1, b2 in zip(
            batch["b1"].to_pylist(), batch["b2"].to_pylist()
        ):
            n_emitted = 0  # guard is per bucket pair, as the message says
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


def neardup_pairs(
    out_dir: str,
    threshold: float,
    *,
    names: tuple[str, str] = ("vec_a", "vec_b"),
    max_pairs_per_task: int = 5_000_000,
) -> tuple[pd.DataFrame, dict]:
    """Exact cosine pairs ≥ threshold over the bucketed layout + prune
    stats.  Bucket-pair (i, j) survives iff the minimum possible angle
    between members, θ(c_i,c_j) − R_i − R_j, is ≤ arccos(threshold)
    (triangle inequality on the sphere ⇒ no false negatives; a small
    radian slack guards float32 storage noise)."""
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta["centroids"]:  # empty layout
        return (
            pd.DataFrame(columns=[names[0], names[1], "sim"]),
            {"n_bucket_pairs": 0, "n_pruned": 0, "nlist": 0},
        )
    C = np.asarray(meta["centroids"], dtype=np.float64)
    live = sorted(int(b) for b in meta["buckets"])
    R = {
        b: float(
            np.arccos(np.clip(meta["buckets"][str(b)]["min_cos"], -1.0, 1.0))
        )
        for b in live
    }
    alpha = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    theta = np.arccos(np.clip(C @ C.T, -1.0, 1.0))
    items, pruned = [], 0
    for x, b1 in enumerate(live):
        for b2 in live[x:]:
            if theta[b1, b2] - R[b1] - R[b2] > alpha + 1e-6:
                pruned += 1
            else:
                items.append({"b1": b1, "b2": b2})
    stats = {
        "n_bucket_pairs": len(items) + pruned,
        "n_pruned": pruned,
        "nlist": int(meta["nlist"]),
    }
    cols = [names[0], names[1], "sim"]
    if not items:
        return pd.DataFrame(columns=cols), stats
    # a few bucket pairs per task: the per-task bucket cache makes
    # consecutive pairs sharing a bucket reuse its decoded matrix, and
    # ~64 tasks amortize Ray task overhead without hurting parallelism
    out = (
        ray.data.from_items(items)
        .map_batches(
            _PairTask(out_dir, meta, threshold, max_pairs_per_task),
            batch_format="pyarrow",
            batch_size=max(1, -(-len(items) // 64)),
        )
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=cols), stats
    out["sim"] = out["sim"].round(6)
    out = out.rename(columns={"id_a": names[0], "id_b": names[1]})
    return (
        out.sort_values([names[0], names[1]]).reset_index(drop=True)[cols],
        stats,
    )


def cached_ivf_dir(
    input_paths: list[str], *, id_col: str, nlist: int, label: str
) -> str:
    """Deterministic /tmp cache location for an IVF layout over the given
    inputs (same identity discipline as corpus.documents_index)."""
    sig = []
    for p in sorted(input_paths):
        st = os.stat(p)
        sig.append([os.path.abspath(p), st.st_size, st.st_mtime_ns])
    tag = hashlib.md5(
        json.dumps([sig, id_col, nlist], sort_keys=True).encode()
    ).hexdigest()[:10]
    d = os.path.join(CACHE_ROOT, f"ivf-{label}-{nlist}-{tag}")
    os.makedirs(d, exist_ok=True)
    return d
