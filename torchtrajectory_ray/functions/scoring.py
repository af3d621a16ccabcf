"""Pluggable similarity scorers.

Analog of the reference's swappable similarity-measure registry
(/root/reference/src/main/java/au/edu/rmit/bdm/Torch/queryEngine/similarity/
SimilarityFunction.java:44-47 — one enum, seven measures behind one
interface) and its runtime measure swap (Engine.update,
Torch/queryEngine/Engine.java:165-171).

Plug contract (what makes a scorer WAND-safe): ``tf_norm(tf, doclen,
avgdl)`` must be monotone non-decreasing in ``tf`` and non-increasing in
``doclen``.  Segment block bounds are stored as (max_tf, min_dl) — raw
corpus statistics, independent of any scorer — so
``tf_norm(blk_max_tf, blk_min_dl)`` dominates every posting in the block
and scorers swap at runtime without rebuilding the index.
"""

from __future__ import annotations

import numpy as np

from torchtrajectory_ray.functions.bm25 import idf as _bm25_idf
from torchtrajectory_ray.functions.bm25 import tf_norm as _bm25_tf_norm


class BM25Scorer:
    """score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))."""

    name = "bm25"

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = float(k1)
        self.b = float(b)

    def idf(self, df, n_docs: float):
        return _bm25_idf(df, n_docs)

    def tf_norm(self, tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
        return _bm25_tf_norm(tf, doclen, avgdl, self.k1, self.b)

    def set_params(self, k1: float | None = None, b: float | None = None) -> None:
        if k1 is not None:
            self.k1 = float(k1)
        if b is not None:
            self.b = float(b)


class TFIDFScorer:
    """Classic log-tf·idf: score(q,d) = Σ_t ln(1 + N/df) · (1 + ln(tf)).

    Doclen-independent (monotone in tf), so the (max_tf, min_dl) block
    bound is exact in tf — the second concrete measure behind the plug
    point (proves the interface, like the reference's LCSS-vs-EDwP swap).
    """

    name = "tfidf"

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        # accepted for interface uniformity; unused by this measure
        self.k1, self.b = float(k1), float(b)

    def idf(self, df, n_docs: float):
        return np.log(1.0 + n_docs / np.asarray(df, dtype=np.float64))

    def tf_norm(self, tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
        return 1.0 + np.log(tf.astype(np.float64))

    def set_params(self, k1: float | None = None, b: float | None = None) -> None:
        if k1 is not None:
            self.k1 = float(k1)
        if b is not None:
            self.b = float(b)


class BM25PlusScorer:
    """BM25+ (Lv & Zhai, CIKM 2011 "Lower-Bounding Term Frequency
    Normalization"): the BM25 tf-normalization plus a constant shift δ
    that lower-bounds long documents' term contribution —

        score(q,d) = Σ_t ln((N+1)/df) · (tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) + δ)

    δ = 1.0 (the paper's default).  WAND-safe: the +δ shift preserves
    monotonicity in tf and anti-monotonicity in doclen, so the stored
    (max_tf, min_dl) block bound still dominates.  Postings only hold
    tf ≥ 1, so the shift applies uniformly (the tf=0 discontinuity the
    paper lower-bounds never materializes in a posting scan)."""

    name = "bm25plus"
    delta = 1.0

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = float(k1)
        self.b = float(b)

    def idf(self, df, n_docs: float):
        return np.log((n_docs + 1.0) / np.asarray(df, dtype=np.float64))

    def tf_norm(self, tf: np.ndarray, doclen: np.ndarray, avgdl: float) -> np.ndarray:
        return _bm25_tf_norm(tf, doclen, avgdl, self.k1, self.b) + self.delta

    def set_params(self, k1: float | None = None, b: float | None = None) -> None:
        if k1 is not None:
            self.k1 = float(k1)
        if b is not None:
            self.b = float(b)


SCORERS: dict[str, type] = {
    "bm25": BM25Scorer,
    "tfidf": TFIDFScorer,
    "bm25plus": BM25PlusScorer,
}


def make_scorer(name: str, k1: float = 1.2, b: float = 0.75):
    try:
        cls = SCORERS[name]
    except KeyError:
        raise ValueError(
            f"unknown scorer {name!r}; registered: {sorted(SCORERS)}"
        ) from None
    return cls(k1=k1, b=b)
