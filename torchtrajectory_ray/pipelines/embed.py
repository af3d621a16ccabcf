"""Deterministic document embedding generation — feature hashing of
token counts into a fixed-dimension vector (the "hashing trick"), the
embedding-production side of the training-data pipeline: documents in,
``list<float>`` vectors out, ready for the knn / near-dup / clustering
operators that consume an embedding column.

Pure function of the text (seeded signs, content-hashed buckets), so
vectors are stable across runs, batch splits, and cluster sizes — the
same determinism contract as the index build.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from torchtrajectory_ray.functions.text import TermHasher

DIM = 64

_EMBED_SINGLETON: dict = {}


class DocEmbedder:
    """map_batches stage: text → L2-normalized hashed-count vector.
    Bucket = term_hash % DIM; sign = one term_hash bit (signed hashing
    keeps the estimator unbiased).  Vectorized over the batch via the
    same factorize + per-(doc, term) tf combine as the index tokenizer."""

    def __init__(self, dim: int = DIM):
        self.dim = dim
        self.hasher = TermHasher()

    def vectors(self, tok_lists: list[list[str]]) -> np.ndarray:
        import itertools

        n_docs = len(tok_lists)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n_docs)
        total = int(counts.sum())
        out = np.zeros((n_docs, self.dim), dtype=np.float64)
        if total == 0:
            return out
        flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
        codes, uniq = pd.factorize(flat, sort=False)
        th = np.fromiter((self.hasher(t) for t in uniq), np.uint64, len(uniq))
        bucket = (th % np.uint64(self.dim)).astype(np.int64)
        sign = ((th >> np.uint64(32)) & np.uint64(1)).astype(np.float64) * 2 - 1
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        np.add.at(out, (doc_idx, bucket[codes]), sign[codes])
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self.vectors([t.split(" ") for t in batch["text"].to_pylist()])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )


def _embed_task(batch: pa.Table, *, dim: int = DIM) -> pa.Table:
    inst = _EMBED_SINGLETON.get(dim)
    if inst is None:
        inst = DocEmbedder(dim)
        _EMBED_SINGLETON[dim] = inst
    return inst(batch)


def doc_embeddings(sf_dir: str, dim: int = DIM) -> ray.data.Dataset:
    """doc_id, embedding — hashed-count vectors for the documents table."""
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_embed_task, fn_kwargs={"dim": dim}, batch_format="pyarrow")


def doc_embedding_neardup(
    sf_dir: str, threshold: float = 0.95, dim: int = DIM
) -> pd.DataFrame:
    """doc_a, doc_b, sim — cosine near-dup pairs over the GENERATED doc
    vectors (embedding-cosine dedup applied to raw documents; exact and
    near duplicate texts land at sim ≈ 1).

    Streamed like :func:`knn.embedding_neardup`: each batch is compared
    against the broadcast full matrix inside ``map_batches`` — the driver
    never holds an n×n similarity matrix (only the n×dim vectors, the
    small side; at 10^12 docs this kernel runs per IVF bucket)."""
    import pyarrow.parquet as pq  # noqa: F401

    eds = doc_embeddings(sf_dir, dim).materialize()  # one embedding pass
    vec_tbl = eds.to_pandas()
    if vec_tbl.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "sim"])
    all_ids = vec_tbl["doc_id"].to_numpy().astype(np.int64)
    all_e = np.stack(vec_tbl["embedding"].to_numpy()).astype(np.float64)

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        e = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        sims = e @ all_e.T  # B × n (vectors are L2-normalized)
        bi, aj = np.nonzero(sims >= threshold)
        a, b = ids[bi], all_ids[aj]
        keep = a < b
        return pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
                "sim": pa.array(np.round(sims[bi, aj][keep], 6), pa.float64()),
            }
        )

    out = (
        eds.map_batches(pairs, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "sim"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
