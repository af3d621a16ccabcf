"""Hybrid retrieval: BM25 candidate generation + embedding-cosine
rerank — the composite that ties the inverted index (lexical recall) to
the document-embedding space (semantic precision).

Shape: the engine's WAND top-k narrows each query to ``candidates``
docs (index-side pruning does the heavy lifting); the rerank then reads
ONLY those candidates' vectors from the staged doc-embedding shards
(predicate-pushdown, same discipline as ``QueryEngine.resolve``) and
re-scores them against the query's own embedding — one small matmul per
query, never a corpus scan.  At cluster scale the rerank stage is a
``map_batches`` fan-out over query chunks; at serving scale it answers
on the driver.

Beyond-reference composite (the reference has no embedding space); the
candidate-then-exact-rescore shape is its LORS/LEVI candidate ring
(/root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/spatialIndex/
LEVI.java:95-112) applied across TWO scoring spaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from torchtrajectory_ray.pipelines.corpus import (
    WEB_QUERIES,
    _engine,
    documents_index,
)
from torchtrajectory_ray.pipelines.embed import DIM, DocEmbedder


def _candidate_vectors(paths: list[str], doc_ids: np.ndarray) -> dict[int, np.ndarray]:
    """doc_id → unit vector for ONLY the requested ids (pushdown read of
    the staged embedding shards)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    wanted = pa.array(sorted(int(d) for d in set(doc_ids)), pa.int64())
    t = pads.dataset(paths, format="parquet").to_table(
        columns=["doc_id", "embedding"],
        filter=pads.field("doc_id").isin(wanted),
    )
    out = {}
    for d, v in zip(t["doc_id"].to_pylist(), t["embedding"].to_pylist()):
        a = np.asarray(v, np.float64)
        n = np.linalg.norm(a)
        out[int(d)] = a / n if n else a
    return out


def semantic_rerank_ds(
    sf_dir: str, k: int = 10, candidates: int = 50, dim: int = DIM
):
    """Distributed form of :func:`semantic_rerank`: candidate generation
    runs on the ``BatchScorer`` actor pool (one open index per actor,
    the QueryPool shape), then a ``groupby(query_id).map_groups`` stage
    reranks each query's candidates — every group does its OWN pushdown
    read of just its candidates' vectors and embeds its query in-task.
    Returns a Dataset of (query_id, rank, doc_id, sim, bm25_score);
    rank-identical to the driver form (tested)."""
    import ray.data  # noqa: F401  (pipeline construction below)

    from torchtrajectory_ray.pipelines.embed import _staged_doc_embeddings
    from torchtrajectory_ray.pipelines.query_batch import batch_topk_pipeline

    idx = documents_index(sf_dir)
    paths = _staged_doc_embeddings(sf_dir, dim)
    terms_by_qid = {q["query_id"]: list(q["terms"]) for q in WEB_QUERIES}
    cand = batch_topk_pipeline(idx, WEB_QUERIES, k=candidates)

    def rerank_group(g: pd.DataFrame) -> pd.DataFrame:
        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        if len(g) == 0:
            return pd.DataFrame(
                columns=["query_id", "rank", "doc_id", "sim", "bm25_score"]
            )
        qid = int(g["query_id"].iloc[0])
        ids = g["doc_id"].to_numpy().astype(np.int64)
        bm = g["score"].to_numpy().astype(np.float64)
        vecs = _candidate_vectors(paths, ids)
        qv = DocEmbedder(dim).vectors([terms_by_qid[qid]])[0]
        m = np.stack([vecs[int(d)] for d in ids])
        sims = np.round(m @ qv, 6)
        order = np.lexsort((ids, -sims))[: min(k, len(ids))]
        return pd.DataFrame(
            {
                "query_id": qid,
                "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                "doc_id": ids[order],
                "sim": sims[order],
                "bm25_score": np.round(bm[order], 6),
            }
        )

    return cand.groupby("query_id").map_groups(
        rerank_group, batch_format="pandas"
    )


def semantic_rerank(
    sf_dir: str, k: int = 10, candidates: int = 50, dim: int = DIM
) -> pd.DataFrame:
    """query_id, rank, doc_id, sim, bm25_score — BM25 ``candidates``
    per query reranked by cosine between the query's hashed embedding
    and the candidates' staged doc embeddings.  Rank is (sim desc,
    doc_id asc) on 6-dp-rounded sims — the suite's standard float-stable
    ordering."""
    from torchtrajectory_ray.pipelines.embed import _staged_doc_embeddings

    eng = _engine(documents_index(sf_dir))
    paths = _staged_doc_embeddings(sf_dir, dim)
    embedder = DocEmbedder(dim)
    cand: dict[int, list[tuple[int, float]]] = {}
    all_ids: list[int] = []
    for q in WEB_QUERIES:
        res = eng.topk(q["terms"], k=candidates)
        cand[q["query_id"]] = res
        all_ids.extend(d for d, _ in res)
    if not all_ids:
        return pd.DataFrame(
            columns=["query_id", "rank", "doc_id", "sim", "bm25_score"]
        )
    vecs = _candidate_vectors(paths, np.asarray(all_ids, np.int64))
    # vectors() takes TOKEN LISTS — a joined string would be iterated
    # per character and hash a meaningless bag of chars
    qvecs = embedder.vectors([list(q["terms"]) for q in WEB_QUERIES])
    rows = []
    for qi, q in enumerate(WEB_QUERIES):
        res = cand[q["query_id"]]
        if not res:
            continue
        ids = np.asarray([d for d, _ in res], np.int64)
        bm = np.asarray([s for _, s in res], np.float64)
        m = np.stack([vecs[int(d)] for d in ids])
        sims = np.round(m @ qvecs[qi], 6)
        order = np.lexsort((ids, -sims))[: min(k, len(ids))]
        for r, i in enumerate(order, 1):
            rows.append(
                (
                    q["query_id"],
                    r,
                    int(ids[i]),
                    float(sims[i]),
                    round(float(bm[i]), 6),
                )
            )
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "sim", "bm25_score"]
    )
