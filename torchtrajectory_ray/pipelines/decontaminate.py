"""Benchmark decontamination: flag corpus docs sharing token n-grams
with an evaluation set.

The standard pretraining hygiene pass (n-gram overlap decontamination):
an evaluation/benchmark corpus is tiny, the training corpus is 100 TB —
so this is the canonical broadcast-small-side shape, the same discipline
as the engine's term-dictionary broadcast (SURVEY.md J2):

1. The benchmark n-gram set is built ONCE from a pruned read (distinct
   grams only), sorted, and shipped to the object store via ``ray.put``
   — every task reads it zero-copy; nothing is re-shipped per batch.
2. One streaming pass over the corpus: each batch generates its docs'
   grams, runs ONE vectorized sorted-membership test
   (``np.searchsorted``) against the broadcast array, and reduces hits
   to per-doc DISTINCT shared-gram counts.  No shuffle, no driver
   materialization; output is the flagged (doc_id, n_shared) rows.

Grams are compared as exact strings (space-joined token windows), so
the operator is oracle-gated: DuckDB reproduces it with
``array_to_string(ts[i:i+n-1], ' ')`` windows — no hashing appears in
the answer's definition (a production variant would hash grams to
int64; the membership plumbing is identical).

For the driver gate the benchmark set is the ``doc_id % 97 == 0`` slice
of the corpus itself, which also pins the must-hold invariant: every
benchmark doc (with at least one full window) flags itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

BENCH_MOD = 97

# Fail-loud ceiling on the broadcast benchmark-gram set (the same
# discipline as kgram_dup_stats' max_dup_hashes): ~5M distinct gram
# strings ≈ a few hundred MB in every worker's heap — beyond that the
# broadcast-small-side assumption this operator is built on no longer
# holds, and silently OOMing a worker is the worst failure mode.  A
# benchmark set that big should go through an exchange (the line_dedup
# join shape) instead; raising the ceiling is a conscious opt-in.
MAX_BENCH_GRAMS = 5_000_000


def _doc_grams(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def benchmark_grams(
    sf_dir: str, n: int = 3, max_grams: int = MAX_BENCH_GRAMS
) -> np.ndarray:
    """Sorted distinct n-gram strings of the benchmark slice — the small
    side (pruned read; distinct-per-batch before the driver fold).
    Raises when the set exceeds ``max_grams`` (see MAX_BENCH_GRAMS)."""

    def grams_of(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        keep = ids % BENCH_MOD == 0
        out: set[str] = set()
        for t in batch.filter(pa.array(keep))["text"].to_pylist():
            out.update(_doc_grams(t.split(" "), n))
        return pa.table({"gram": pa.array(sorted(out), pa.string())})

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(grams_of, batch_format="pyarrow")
        .to_pandas()  # distinct grams per block only — the benchmark is tiny
    )
    out = np.unique(parts["gram"].to_numpy())
    if out.size > max_grams:
        raise ValueError(
            f"benchmark gram set has {out.size} distinct {n}-grams > "
            f"max_grams={max_grams}: too large to broadcast to every "
            "worker.  Route the benchmark through an exchange (the "
            "line_dedup join shape) or raise max_grams explicitly."
        )
    return out


def decontaminate(
    sf_dir: str,
    n: int = 3,
    min_shared: int = 1,
    max_grams: int = MAX_BENCH_GRAMS,
) -> ray.data.Dataset:
    """Docs sharing ≥ ``min_shared`` DISTINCT ``n``-grams with the
    benchmark slice: ``doc_id, n_shared`` (benchmark docs flag
    themselves — exact leakage is the base case)."""
    ref = ray.put(benchmark_grams(sf_dir, n, max_grams))

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
            }
        )
        if bench.size == 0:
            return empty
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        doc_idx: list[int] = []
        flat: list[str] = []
        for i, t in enumerate(batch["text"].to_pylist()):
            gs = set(_doc_grams(t.split(" "), n))  # distinct within doc
            doc_idx.extend([i] * len(gs))
            flat.extend(gs)
        if not flat:
            return empty
        arr = np.asarray(flat, dtype=object)
        pos = np.searchsorted(bench, arr)
        pos[pos == len(bench)] = 0
        hit = bench[pos] == arr
        counts = np.bincount(
            np.asarray(doc_idx, np.int64)[hit], minlength=len(ids)
        )
        keep = counts >= min_shared
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_shared": pa.array(counts[keep].astype(np.int64), pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(flag, batch_format="pyarrow")
