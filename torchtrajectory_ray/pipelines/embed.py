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

import os

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


# --- model-backed embedding stage (the ST1 constructor-state shape) ----------


def export_dummy_model(
    path: str, dim_in: int = DIM, dim_out: int = 32, seed: int = 1234
) -> str:
    """Write a deterministic 'model' artifact — a seeded projection
    matrix — to ``path`` (.npz).  Stands in for a real encoder
    checkpoint so the actor-pool load-once pattern below is exercised
    end to end; swap the file (and ``ModelDocEmbedder._load``) for a
    real model without touching the Ray plumbing."""
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((dim_in, dim_out)) / np.sqrt(dim_in)).astype(
        np.float32
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, w=w)
    os.replace(tmp, path)
    return path


class ModelDocEmbedder:
    """ACTOR-POOL map_batches stage: text → model-projected embedding.

    The reference's TorGraph singleton shape (ST1,
    mapMatching/TorGraph.java:37-97 — heavyweight state constructed once
    per worker, reused across every batch): the 'model' (projection
    matrix) is LOADED FROM DISK IN ``__init__`` — once per actor, never
    per batch — and ``__call__`` runs batched inference (hashed count
    vector → W projection → L2 norm).  Pass the CLASS to
    ``map_batches(ModelDocEmbedder, fn_constructor_kwargs=...,
    concurrency=N)`` so Ray builds an actor pool; this is the stage a
    user swaps a real encoder into (load the checkpoint in ``_load``,
    batch the forward pass in ``__call__``).

    ``load_log``: optional path; each LOAD appends one line — the
    actor-reuse test asserts #lines == #actors, not #batches."""

    def __init__(
        self,
        model_path: str,
        dim: int = DIM,
        load_log: str | None = None,
    ):
        self.base = DocEmbedder(dim)
        self.w = self._load(model_path)
        if load_log:
            with open(load_log, "a") as f:
                f.write(f"{os.getpid()}\n")

    @staticmethod
    def _load(model_path: str) -> np.ndarray:
        with np.load(model_path) as z:
            return z["w"].astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = self.base.vectors(
            [t.split(" ") for t in batch["text"].to_pylist()]
        )
        out = h @ self.w
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        out = out / norms
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in out],
                    pa.list_(pa.float32()),
                ),
            }
        )


def doc_embeddings_model(
    sf_dir: str,
    model_path: str | None = None,
    dim: int = DIM,
    concurrency: int = 2,
    load_log: str | None = None,
) -> ray.data.Dataset:
    """doc_id, embedding through the ACTOR-POOL model stage.  With
    ``model_path=None`` a deterministic dummy model is exported to a
    content-keyed /tmp path first (hermetic default); pass a real
    checkpoint path in production."""
    if model_path is None:
        model_path = os.path.join("/tmp/ttray_cache", f"dummy-model-{dim}.npz")
        os.makedirs(os.path.dirname(model_path), exist_ok=True)
        if not os.path.exists(model_path):
            export_dummy_model(model_path, dim_in=dim)
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        ModelDocEmbedder,
        fn_constructor_kwargs=dict(
            model_path=model_path, dim=dim, load_log=load_log
        ),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def _staged_doc_embeddings(sf_dir: str, dim: int) -> list[str]:
    """One embedding pass staged to parquet shards (content-keyed /tmp
    cache) — the IVF build and any other embedding consumer read these
    files instead of re-embedding."""
    import hashlib
    import json

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        json.dumps([os.path.abspath(src), st.st_size, st.st_mtime_ns, dim]).encode()
    ).hexdigest()[:10]
    stage = os.path.join("/tmp/ttray_cache", f"docvecs-{tag}")
    marker = os.path.join(stage, "_STAGED")
    if not os.path.exists(marker):
        # no marker = stage incomplete (or a crash mid-write left partial
        # shards): start clean, or the rerun would append a second shard
        # set and duplicate every vector
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        doc_embeddings(sf_dir, dim).write_parquet(stage)
        with open(marker, "w") as f:
            f.write("ok")
    return sorted(
        os.path.join(stage, p)
        for p in os.listdir(stage)
        if p.endswith(".parquet")
    )


def doc_embedding_neardup(
    sf_dir: str,
    threshold: float = 0.95,
    dim: int = DIM,
    max_pairs_per_task: int = 5_000_000,
) -> pd.DataFrame:
    """doc_a, doc_b, sim — cosine near-dup pairs over the GENERATED doc
    vectors (embedding-cosine dedup applied to raw documents; exact and
    near duplicate texts land at sim ≈ 1).

    Exact, through the bucket-partitioned IVF layout (ivf.neardup_pairs):
    vectors staged to parquet, bucketed by centroid, and bucket-PAIR
    tasks compute the cross blocks — no full-matrix broadcast, per-task
    memory = two buckets, and at near-dup thresholds (≥0.9) the sphere
    triangle inequality prunes most of the bucket-pair grid."""
    from torchtrajectory_ray.pipelines import ivf

    paths = _staged_doc_embeddings(sf_dir, dim)
    d = ivf.cached_ivf_dir(paths, id_col="doc_id", nlist=None, label="docvec")
    ivf.build_ivf(paths, d, id_col="doc_id", nlist=None)
    out, _stats = ivf.neardup_pairs(
        d,
        threshold,
        names=("doc_a", "doc_b"),
        max_pairs_per_task=max_pairs_per_task,
    )
    return out
