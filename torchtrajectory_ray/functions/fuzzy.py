"""Vectorized edit-distance-≤1 term matching (the dictionary side of a
did-you-mean / fuzzy-search feature).

A candidate term matches a query at Levenshtein distance ≤ 1 iff it is
equal, a single substitution (equal length, Hamming ≤ 1), a single
deletion (candidate one char shorter), or a single insertion (candidate
one char longer).  All four cases reduce to two vectorized kernels over
a fixed-width codepoint matrix:

- equal length: ``(cand != query).sum(axis=1) <= 1``
- length ± 1 (align the longer string ``a`` against the shorter ``b``):
  a one-char deletion from ``a`` yields ``b`` iff there is a split
  ``i`` with ``a[:i] == b[:i]`` and ``a[i+1:] == b[i:]`` — i.e. the
  first left-aligned mismatch is at or after the last shifted-aligned
  mismatch.  Both bounds come from one comparison matrix each
  (``argmax`` of the mismatch mask), no per-string loop.

The dictionary is grouped by length once (three groups probed per
query), so a fuzzy probe is O(|terms of length L-1..L+1|) vectorized
comparisons — the same dictionary-scan cost class as ``prefix_terms``.

Reference analog: the name-lookup dictionary scan
(Torch/base/db/NameEdgeIdLookup.java:17-27) with an approximate
comparator instead of exact equality.
"""

from __future__ import annotations

import numpy as np


def _codes(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, zero-padded."""
    a = strs.astype(f"<U{width}")
    return a.view(np.uint32).reshape(len(a), width)


def _off_by_one_mask(longer: np.ndarray, shorter: str) -> np.ndarray:
    """True where deleting ONE char of ``longer[i]`` yields ``shorter``.
    ``longer`` rows must have length ``len(shorter) + 1``."""
    lb = len(shorter)
    if len(longer) == 0:
        return np.zeros(0, bool)
    a = _codes(longer, lb + 1)
    b = _codes(np.asarray([shorter]), max(lb, 1))[0]
    if lb == 0:  # deleting the only char of a 1-char string
        return np.ones(len(longer), bool)
    left_mism = a[:, :lb] != b[None, :lb]  # a[j] vs b[j]
    right_mism = a[:, 1 : lb + 1] != b[None, :lb]  # a[j+1] vs b[j]
    # first left mismatch (lb if none)
    any_l = left_mism.any(axis=1)
    i_max = np.where(any_l, left_mism.argmax(axis=1), lb)
    # last right mismatch + 1 (0 if none)
    any_r = right_mism.any(axis=1)
    i_min = np.where(
        any_r, lb - right_mism[:, ::-1].argmax(axis=1), 0
    )
    return i_min <= i_max


def _query_del_mask(shorter: np.ndarray, query: str) -> np.ndarray:
    """True where deleting ONE char of ``query`` yields ``shorter[i]``.
    ``shorter`` rows must have length ``len(query) - 1`` — the same
    split condition as :func:`_off_by_one_mask` with the matrix on the
    short side."""
    lb = len(query) - 1
    if len(shorter) == 0:
        return np.zeros(0, bool)
    if lb == 0:
        return np.ones(len(shorter), bool)
    a = _codes(np.asarray([query]), lb + 1)[0]
    b = _codes(shorter, lb)
    left_mism = b != a[None, :lb]  # b[j] vs q[j]
    right_mism = b != a[None, 1 : lb + 1]  # b[j] vs q[j+1]
    any_l = left_mism.any(axis=1)
    i_max = np.where(any_l, left_mism.argmax(axis=1), lb)
    any_r = right_mism.any(axis=1)
    i_min = np.where(any_r, lb - right_mism[:, ::-1].argmax(axis=1), 0)
    return i_min <= i_max


def edit1_mask(
    query: str, candidates: np.ndarray, lens: np.ndarray | None = None
) -> np.ndarray:
    """Boolean mask over ``candidates`` (1-D str array) marking terms
    with Levenshtein distance ≤ 1 from ``query``.  ``lens`` may carry
    precomputed candidate lengths — the length scan is half of a cold
    probe's cost, so repeat callers (an engine serving many fuzzy
    queries) should cache it."""
    cands = np.asarray(candidates)
    if cands.size == 0:
        return np.zeros(0, bool)
    if lens is None:
        lens = np.fromiter((len(c) for c in cands), np.int64, len(cands))
    lq = len(query)
    out = np.zeros(len(cands), bool)

    eq = lens == lq
    if eq.any() and lq:
        qc = _codes(np.asarray([query]), lq)[0]
        out[eq] = (_codes(cands[eq], lq) != qc[None, :]).sum(axis=1) <= 1
    elif eq.any():
        out[eq] = True  # both empty

    longer = lens == lq + 1
    if longer.any():
        out[longer] = _off_by_one_mask(cands[longer], query)

    shorter = lens == lq - 1
    if shorter.any():
        out[shorter] = _query_del_mask(cands[shorter], query)
    return out


def _editk_group(codes: np.ndarray, qcodes: np.ndarray, k: int) -> np.ndarray:
    """Levenshtein(query, row) <= k over an equal-length candidate group.

    One DP row per query char, vectorized across all candidates.  The
    horizontal dependency cur[j] = min(d[j], cur[j-1]+1) unrolls to
    cur[j] = min_{j'<=j} (d[j'] + (j-j')) — a min-plus prefix scan, so
    each row is a ``minimum.accumulate`` over (d - j) plus j: no per-
    candidate or per-cell Python loop."""
    n, lc = codes.shape
    m = len(qcodes)
    j_idx = np.arange(lc + 1, dtype=np.int32)
    prev = np.broadcast_to(j_idx, (n, lc + 1)).copy()
    cur = np.empty_like(prev)
    for i in range(1, m + 1):
        # d[j] = min(vertical prev[j]+1, diagonal prev[j-1]+cost)
        cur[:, 0] = i
        np.minimum(
            prev[:, 1:] + 1,
            prev[:, :-1] + (codes != qcodes[i - 1]),
            out=cur[:, 1:],
        )
        # resolve the horizontal chain with a min-plus scan
        cur -= j_idx
        np.minimum.accumulate(cur, axis=1, out=cur)
        cur += j_idx
        prev, cur = cur, prev
    return prev[:, lc] <= k


def editk_mask(
    query: str,
    candidates: np.ndarray,
    k: int = 2,
    lens: np.ndarray | None = None,
) -> np.ndarray:
    """Boolean mask over ``candidates`` marking terms with Levenshtein
    distance ≤ ``k`` from ``query`` — the general-``k`` companion of
    :func:`edit1_mask` (which stays the fast path for k=1).  Candidates
    are grouped by length (only |len−|query|| ≤ k can match — length
    difference lower-bounds edit distance) and each group runs the
    vectorized banded-by-length DP of :func:`_editk_group`."""
    cands = np.asarray(candidates)
    out = np.zeros(len(cands), bool)
    if cands.size == 0:
        return out
    if lens is None:
        lens = np.fromiter((len(c) for c in cands), np.int64, len(cands))
    lq = len(query)
    qcodes = (
        _codes(np.asarray([query]), lq)[0] if lq else np.empty(0, np.uint32)
    )
    for lc in range(max(0, lq - k), lq + k + 1):
        sel = lens == lc
        if not sel.any():
            continue
        if lc == 0 or lq == 0:
            # distance to the empty string is the other string's length
            out[sel] = max(lc, lq) <= k
            continue
        out[sel] = _editk_group(_codes(cands[sel], lc), qcodes, k)
    return out


def levenshtein_ref(a: str, b: str) -> int:
    """Reference DP Levenshtein (tests only)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]
