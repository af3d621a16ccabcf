"""Misra-Gries / SpaceSaving heavy-hitter summaries (Misra & Gries 1982;
Metwally et al. 2005; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012 — all public).

The 100-TB path for top-k term frequencies: each block reduces to a
summary of AT MOST ``m`` (term, count) rows regardless of its
vocabulary, summaries merge by count-sum + (m+1)-th-largest subtraction,
and the global guarantee is

    true(x) - deficit  <=  est(x)  <=  true(x)        for kept x
    true(x)            <=  deficit                    for dropped x

where ``deficit`` (the sum of all subtractions) is bounded by
n_tokens/(m+1).  A second exact counting pass over the O(m) candidate
set then recovers EXACT top-k counts — the heavy-hitter analog of the
engine's candidate-then-verify discipline (WAND, trigram scans), which
is why the pipeline built on this is oracle-gatable bit-for-bit while
never shuffling a vocabulary-sized table.
"""

from __future__ import annotations

import numpy as np


def mg_summary(
    terms: np.ndarray, counts: np.ndarray, m: int
) -> tuple[dict[str, int], int]:
    """Reduce exact (term, count) pairs to an ``m``-counter Misra-Gries
    summary; returns (summary, subtracted-deficit)."""
    if len(terms) <= m:
        return dict(zip(terms, (int(c) for c in counts))), 0
    order = np.argsort(-counts, kind="stable")
    d = int(counts[order[m]])  # the (m+1)-th largest count
    keep = order[:m]
    kept = counts[keep] - d
    pos = kept > 0
    return dict(zip(terms[keep][pos], (int(c) for c in kept[pos]))), d


def mg_merge(
    a: dict[str, int], b: dict[str, int], m: int
) -> tuple[dict[str, int], int]:
    """Merge two MG summaries into one with at most ``m`` counters;
    returns (merged, subtracted-deficit this merge)."""
    c = dict(a)
    for t, n in b.items():
        c[t] = c.get(t, 0) + n
    if len(c) <= m:
        return c, 0
    vals = np.fromiter(c.values(), np.int64, len(c))
    d = int(np.partition(vals, -(m + 1))[-(m + 1)])
    out = {t: n - d for t, n in c.items() if n - d > 0}
    return out, d


def mg_fold(
    summaries: list[dict[str, int]], m: int
) -> tuple[dict[str, int], int]:
    """Fold block summaries; returns (summary, total deficit).  The
    deficit is a UNIVERSAL bound: any term absent from the result has
    true count <= deficit, and every kept estimate undercounts by at
    most it (each element survives a subset of the merges, so the sum
    over all merges bounds every path)."""
    acc: dict[str, int] = {}
    deficit = 0
    for s in summaries:
        acc, d = mg_merge(acc, s, m)
        deficit += d
    return acc, deficit
