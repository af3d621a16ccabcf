"""Similarity search over an embedding column (``list<float>``).

Training-data-pipeline operators beyond the reference's spatial candidate
search (the structural analog is LEVI's expand-until-k-confident ring
search, /root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/
spatialIndex/LEVI.java:95-112 — upper-bound candidate generation + exact
scoring is exactly brute-force-cosine's shape):

- ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once (small side shipped with the task closure / object store, never
  re-read per batch) and every batch does ONE matmul; per-batch partial
  top-k keeps the driver merge at Q × k × n_batches rows.
- ``knn_ivf`` — the scale path: coarse k-means centroids (seeded,
  deterministic), vectors bucketed by nearest centroid in one
  ``map_batches`` pass, queries probe only ``nprobe`` buckets.  At 10^12
  rows the bucket assignment is a partition key for parquet layout so a
  probe reads only its buckets' files.
- ``embedding_neardup`` — cosine near-duplicate pairs via the same
  brute-force kernel (symmetric, a < b, threshold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

QUERY_VEC_IDS = list(range(8))


def _load_embeddings_matrix(sf_dir: str, vec_ids: list[int]) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    order = {int(v): i for i, v in enumerate(ids)}
    rows = [t["embedding"][order[v]].as_py() for v in vec_ids]
    return np.asarray(rows, dtype=np.float64)


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def _cosine(q: np.ndarray, e: np.ndarray) -> np.ndarray:
    """Q×B cosine-similarity matrix (float64, fixed accumulation order)."""
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    en = np.linalg.norm(e, axis=1, keepdims=True)
    return (q @ e.T) / (qn * en.T)


def knn_bruteforce(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """query_id, rank, neighbor_id, sim — exact cosine top-k of the fixed
    query set against the whole embeddings table."""
    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)

    def batch_topk(batch: pa.Table) -> pa.Table:
        e = _batch_matrix(batch)
        vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
        sims = _cosine(q, e)
        # per-batch selection uses the MERGE'S exact ordering (rounded sim
        # desc, id asc): truncating a batch to its top-k under the final
        # ordering can never drop a global top-k element, whatever the
        # tie structure
        kk = min(k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            s = sims[qi]
            sel = np.lexsort((vec_ids, -np.round(s, 6)))[:kk]
            out_q.extend([QUERY_VEC_IDS[qi]] * len(sel))
            out_n.extend(vec_ids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(batch_topk, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    partials["sim"] = partials["sim"].round(6)
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows(), 1):
            rows.append((int(qid), r, int(row["neighbor_id"]), row["sim"]))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id", "sim"])


# --- IVF (coarse-quantizer bucketing) ----------------------------------------


def _train_centroids(sample: np.ndarray, nlist: int, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample (at 10^12 rows this is
    a ray stage over a ``ds.random_sample``; centroids stay small and are
    broadcast)."""
    rng = np.random.default_rng(42)
    centroids = sample[rng.choice(len(sample), size=nlist, replace=False)]
    for _ in range(iters):
        d = _cosine(centroids, sample)  # nlist × n
        assign = np.argmax(d, axis=0)
        for c in range(nlist):
            mask = assign == c
            if mask.any():
                centroids[c] = sample[mask].mean(axis=0)
    return centroids


def knn_ivf(
    sf_dir: str, k: int = 10, nlist: int = 16, nprobe: int = 4
) -> pd.DataFrame:
    """Approximate cosine top-k: probe only the ``nprobe`` nearest
    centroid buckets per query.  Columns match :func:`knn_bruteforce`."""
    import pyarrow.parquet as pq

    all_e = _batch_matrix(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    )
    centroids = _train_centroids(all_e, nlist)
    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    probe = np.argsort(-_cosine(q, centroids), axis=1)[:, :nprobe]  # Q × nprobe

    def bucketed_topk(batch: pa.Table) -> pa.Table:
        e = _batch_matrix(batch)
        vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
        assign = np.argmax(_cosine(centroids, e), axis=0)
        sims = _cosine(q, e)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q)):
            mask = np.isin(assign, probe[qi])
            if not mask.any():
                continue
            s = sims[qi][mask]
            ids = vec_ids[mask]
            kk = min(k, len(s))
            sel = np.lexsort((ids, -np.round(s, 6)))[:kk]
            out_q.extend([QUERY_VEC_IDS[qi]] * len(sel))
            out_n.extend(ids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(bucketed_topk, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame(columns=["query_id", "rank", "neighbor_id", "sim"])
    partials["sim"] = partials["sim"].round(6)
    rows = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        for r, (_, row) in enumerate(g.iterrows(), 1):
            rows.append((int(qid), r, int(row["neighbor_id"]), row["sim"]))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id", "sim"])


# --- embedding near-dup ------------------------------------------------------


def embedding_neardup(sf_dir: str, threshold: float = 0.45) -> pd.DataFrame:
    """vec_a, vec_b, sim — all pairs (a < b) with cosine ≥ threshold.

    Each batch is compared against the full (broadcast) matrix — O(n·B)
    per batch, n² total work but streamed; at 10^12 rows this kernel runs
    per IVF bucket instead of globally (same code, bucketed input)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_e = _batch_matrix(t)
    all_ids = t["vec_id"].to_numpy().astype(np.int64)

    def pairs(batch: pa.Table) -> pa.Table:
        e = _batch_matrix(batch)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        sims = _cosine(e, all_e)
        bi, aj = np.nonzero(sims >= threshold)
        va, vb = ids[bi], all_ids[aj]
        keep = va < vb
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vb[keep], pa.int64()),
                "sim": pa.array(np.round(sims[bi, aj][keep], 6), pa.float64()),
            }
        )

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(pairs, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=["vec_a", "vec_b", "sim"])
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
