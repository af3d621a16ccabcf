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
- ``knn_ivf`` — the scale path through the bucket-partitioned IVF layout
  (pipelines/ivf.py): centroids trained on a distributed sample, vectors
  stored under per-bucket parquet dirs, probes read ONLY ``nprobe``
  buckets' files (``knn_ivf_stats`` audits bytes read vs total).
- ``embedding_neardup`` — exact cosine near-duplicate pairs via
  bucket-pair tasks over the same layout (no full-matrix broadcast;
  sphere-triangle-inequality pruning of impossible bucket pairs).
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


def range_search_bruteforce(
    sf_dir: str, threshold: float = 0.25
) -> pd.DataFrame:
    """query_id, neighbor_id, sim — radius query (ALL vectors with
    cosine ≥ ``threshold`` to each fixed query; the Faiss range_search
    shape): exact streaming scan, each batch emits only its hits."""
    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    qids = np.asarray(QUERY_VEC_IDS, np.int64)

    def batch_hits(batch: pa.Table) -> pa.Table:
        e = _batch_matrix(batch)
        vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
        sims = _cosine(q, e)
        qi, bi = np.nonzero(sims >= threshold)
        return pa.table(
            {
                "query_id": pa.array(qids[qi], pa.int64()),
                "neighbor_id": pa.array(vec_ids[bi], pa.int64()),
                "sim": pa.array(sims[qi, bi], pa.float64()),
            }
        )

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(batch_hits, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    out["sim"] = out["sim"].round(6)
    return out.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)


def range_search_ivf(sf_dir: str, threshold: float = 0.25) -> pd.DataFrame:
    """The same radius query through the persistent IVF layout —
    triangle-inequality bucket pruning, lossless (`ivf.range_search`)."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _ = ivf.range_search(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, threshold=threshold
    )
    return out


# --- IVF (bucket-partitioned layout, see pipelines/ivf.py) -------------------


def _sf_ivf_dir(sf_dir: str, nlist: int | None = None) -> str:
    """Build (or reuse) the bucketed IVF layout for the sf embeddings.
    ``nlist=None`` (default) auto-derives the centroid count from the
    corpus size (ivf.auto_nlist) — the scale-safe sizing."""
    from torchtrajectory_ray.pipelines import ivf

    src = f"{sf_dir}/embeddings.parquet"
    d = ivf.cached_ivf_dir([src], id_col="vec_id", nlist=nlist, label="emb")
    ivf.build_ivf([src], d, id_col="vec_id", nlist=nlist)
    return d


def knn_ivf(
    sf_dir: str, k: int = 10, nlist: int | None = None, nprobe: int = 4
) -> pd.DataFrame:
    """Approximate cosine top-k through the bucket-partitioned IVF index:
    centroids trained on a distributed sample, vectors stored under
    ``bucket-NNNN/`` parquet dirs, and the probe READS ONLY the
    ``nprobe`` probed buckets' files (IO pruning, not scan-and-mask).
    Columns match :func:`knn_bruteforce`."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _stats = ivf.probe_topk(
        _sf_ivf_dir(sf_dir, nlist), QUERY_VEC_IDS, q, k=k, nprobe=nprobe
    )
    return out


def knn_ivf_fullprobe(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """IVF probe at nprobe = #centroids: every bucket is read, so the
    result is EXACT — identical to :func:`knn_bruteforce` by
    construction (the oracle-gated form of the IVF exactness claim;
    approximate probes share all the same code, only the probe set
    shrinks)."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _stats = ivf.probe_topk(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe=10**9
    )
    return out


def knn_ivf_batch(
    sf_dir: str, k: int = 10, nprobe: int = 4
) -> pd.DataFrame:
    """The fixed query workload through the DATASET-NATIVE batch probe
    (ivf.probe_topk_ds): queries shuffle to their probed centroids, each
    centroid group scores its queries against one bucket file at a time,
    partial top-k merge per query — the million-query serving shape (no
    driver-side query matrix or partial-row materialization).
    Rank-identical to :func:`knn_ivf` at the same nprobe (tested)."""
    from torchtrajectory_ray.pipelines import ivf

    want = pa.array(QUERY_VEC_IDS, pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.is_in(batch["vec_id"], value_set=want))
        return t.rename_columns(["query_id", "embedding"])

    queries = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(pick, batch_format="pyarrow")
    out = (
        ivf.probe_topk_ds(
            _sf_ivf_dir(sf_dir), queries, k=k, nprobe=nprobe
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return out[["query_id", "rank", "neighbor_id", "sim"]]


def knn_ivf_batch_fullprobe(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """The Dataset-native batch probe at nprobe = #centroids: every query
    routes to every bucket, so the distributed serving path is EXACT and
    shares :func:`knn_bruteforce`'s SQL oracle — the driver-gated form of
    ``test_probe_topk_ds_matches_driver_probe`` (approximate batch probes
    run the same code with a smaller probe set)."""
    return knn_ivf_batch(sf_dir, k=k, nprobe=10**9)


# fixed vector-takedown workload: disjoint from QUERY_VEC_IDS so every
# query still resolves, present at every sf (embeddings has 500 rows)
DELETED_VEC_IDS: list[int] = sorted(range(100, 200, 4))


def _sf_ivf_dir_deleted(sf_dir: str) -> str:
    """Copy-on-write variant of the sf IVF layout with the fixed
    takedown workload tombstoned (ivf.delete_vectors), built once."""
    import os
    import shutil

    from torchtrajectory_ray.pipelines import ivf

    base = _sf_ivf_dir(sf_dir)
    out = base + "-del"
    marker = os.path.join(out, "_DELETES_APPLIED")
    if not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
        shutil.copytree(base, out)
        ivf.delete_vectors(out, DELETED_VEC_IDS)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def knn_deleted(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Full probe over the TOMBSTONED layout: exact cosine top-k among
    the live vectors only (the vector-takedown serving claim, driver-
    gated against the brute-force SQL minus the deleted ids)."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _ = ivf.probe_topk(
        _sf_ivf_dir_deleted(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe=10**9
    )
    return out


def knn_ivf_sq8(
    sf_dir: str, k: int = 10, nprobe: int = 4
) -> pd.DataFrame:
    """IVF probe through the int8 codes (ivf.probe_topk_sq8): the scan
    reads only the quantized column (~4× fewer bytes than the floats),
    then an exact float rescore of the margin-qualified candidates makes
    the result RANK-IDENTICAL to :func:`knn_ivf` at the same nprobe —
    guaranteed by the quantization error bound, not tuned."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _stats = ivf.probe_topk_sq8(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe=nprobe
    )
    return out


def knn_ivf_sq8_fullprobe(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """The quantized probe at nprobe = #centroids: candidate generation
    over int8 codes + exact rescore over every bucket ⇒ exactly
    :func:`knn_bruteforce` (shares its SQL oracle — the driver-gated form
    of the quantization-with-rescore exactness claim)."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _stats = ivf.probe_topk_sq8(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe=10**9
    )
    return out


def knn_ivf_sq8_stats(
    sf_dir: str, k: int = 10, nprobe: int = 4
) -> dict:
    """Byte audit of the quantized probe: compressed bytes of the sq8
    column actually scanned vs what the float column would have cost
    over the same probed buckets (parquet column-chunk metadata)."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    _, stats = ivf.probe_topk_sq8(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe=nprobe
    )
    return stats


def knn_ivf_stats(
    sf_dir: str, k: int = 10, nlist: int | None = None, nprobe: int = 4
) -> dict:
    """IO-pruning audit of the probe: bytes actually read vs the layout
    total (the lineage/stats check for the scale path)."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    _, stats = ivf.probe_topk(
        _sf_ivf_dir(sf_dir, nlist), QUERY_VEC_IDS, q, k=k, nprobe=nprobe
    )
    return stats


def knn_ivf_exact(
    sf_dir: str, k: int = 10, nprobe0: int = 4
) -> pd.DataFrame:
    """EXACT cosine top-k through the IVF layout with branch-and-bound
    early termination (ivf.probe_topk_exact): identical to
    :func:`knn_bruteforce` — and oracle-gated as such — while reading
    only the buckets whose admissible bound can still reach the current
    kth-best.  The scale answer to "exact ANN": no full scan, no recall
    loss."""
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    out, _stats = ivf.probe_topk_exact(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe0=nprobe0
    )
    return out


def knn_ivf_exact_stats(
    sf_dir: str, k: int = 10, nprobe0: int = 4
) -> dict:
    from torchtrajectory_ray.pipelines import ivf

    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)
    _, stats = ivf.probe_topk_exact(
        _sf_ivf_dir(sf_dir), QUERY_VEC_IDS, q, k=k, nprobe0=nprobe0
    )
    return stats


# --- embedding near-dup ------------------------------------------------------


def embedding_neardup(
    sf_dir: str,
    threshold: float = 0.45,
    max_pairs_per_task: int = 5_000_000,
) -> pd.DataFrame:
    """vec_a, vec_b, sim — ALL pairs (a < b) with cosine ≥ threshold,
    exact, via bucket-pair tasks over the IVF layout (ivf.neardup_pairs):
    no full-matrix broadcast, per-task memory = two buckets, and the
    sphere triangle inequality prunes bucket pairs that cannot hold a
    qualifying pair (no false negatives)."""
    from torchtrajectory_ray.pipelines import ivf

    out, _stats = ivf.neardup_pairs(
        _sf_ivf_dir(sf_dir),
        threshold,
        names=("vec_a", "vec_b"),
        max_pairs_per_task=max_pairs_per_task,
    )
    return out


def embedding_dedup_groups(
    sf_dir: str, threshold: float = 0.45
) -> pd.DataFrame:
    """(vec_id, rep_id) — semantic near-dup GROUPS over the embedding
    column: the exact cosine pair set (bucket-pair pruned, lossless)
    fed through the SAME hash-to-min connected-components machinery the
    text chains use.  Deterministic end to end, so SQL-oracle-gated
    (recursive-CTE transitive closure over the cosine self-join) — the
    embedding analog of ``neardup_components``."""
    from torchtrajectory_ray.pipelines import dedup

    pairs = embedding_neardup(sf_dir, threshold)[["vec_a", "vec_b"]].rename(
        columns={"vec_a": "doc_a", "vec_b": "doc_b"}
    )
    comps = dedup.connected_components(pairs)
    return comps.rename(columns={"doc_id": "vec_id"})


def knn_filtered(sf_dir: str, k: int = 10, label: int = 3) -> pd.DataFrame:
    """query_id, rank, neighbor_id, sim — FILTERED vector search (the
    metadata-constrained ANN every vector store exposes): exact cosine
    top-k restricted to vectors whose ``label`` matches the predicate.
    The filter applies INSIDE the scan (each batch masks its rows before
    the matmul — predicate pushdown into the distance computation), so
    selective filters reduce compute instead of post-filtering a top-k
    that might starve."""
    q = _load_embeddings_matrix(sf_dir, QUERY_VEC_IDS)

    def batch_topk(batch: pa.Table) -> pa.Table:
        keep = batch["label"].to_numpy() == label
        out_q, out_n, out_s = [], [], []
        if keep.any():
            batch = batch.filter(pa.array(keep))
            e = _batch_matrix(batch)
            vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
            sims = _cosine(q, e)
            kk = min(k, sims.shape[1])
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
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
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
