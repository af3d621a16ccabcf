"""Bottom-k (KMV) hash sample — a deterministic, mergeable, fixed-size
uniform sample without replacement; the order-statistics sibling of the
HLL register fold (functions/hll.py).

Keying the sample on ``mix64(id)`` makes it a pure function of the ID
SET: independent of partitioning, batch boundaries, execution order and
retries, and merging two node-local samples is just "union, keep the k
smallest hashes" (Bar-Yossef et al. RANDOM'02 — the k-minimum-values
construction; used here for quantiles rather than distinct counts).
From the sample, any quantile is estimated with rank error
O(1/sqrt(k)) — the classic uniform-sampling bound — regardless of the
value distribution, which is what the bounded-domain exact histogram
(textstats.length_quantile_thresholds) cannot offer on continuous
doubles.

``mix64`` is the splitmix64 finalizer — a BIJECTION on uint64, so
distinct ids can never collide and the bottom-k rows are unique by
construction.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def mix64(ids: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over int64/uint64 ids (vectorized, wrapping
    uint64 arithmetic; invertible, so injective on ids)."""
    z = np.asarray(ids).astype(np.uint64, copy=True) + _C1
    z = (z ^ (z >> np.uint64(30))) * _C2
    z = (z ^ (z >> np.uint64(27))) * _C3
    return z ^ (z >> np.uint64(31))


def bottom_k(h: np.ndarray, values: np.ndarray, k: int):
    """The k smallest-hash rows of (h, values) — the KMV partial.
    Output order is unspecified (callers sort values before use); ties
    cannot occur because mix64 is injective and ids are unique."""
    if len(h) <= k:
        return h, values
    idx = np.argpartition(h, k)[:k]
    return h[idx], values[idx]


def quantile_disc(sample_values: np.ndarray, ps) -> np.ndarray:
    """Discrete quantiles of the sample under the quantile_disc index
    convention (sorted element at ceil(p*m) - 1), matching DuckDB's and
    textstats.length_quantile_thresholds' convention so the estimate is
    comparable against the exact operator."""
    v = np.sort(np.asarray(sample_values))
    m = len(v)
    idx = np.ceil(np.asarray(ps, dtype=np.float64) * m).astype(np.int64) - 1
    return v[np.clip(idx, 0, m - 1)]
