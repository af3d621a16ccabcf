"""Sequence packing for LLM pretraining: concat-and-chunk offsets via a
distributed prefix scan.

Pretraining dataloaders concatenate documents in a fixed order and slice
the token stream into fixed-size sequences ("bins").  The operator that
assigns every document its global token offset — and therefore its
bin id and intra-bin offset — is a PREFIX SUM over token counts in
doc_id order.  Ray Data has no scan primitive (``groupby``/``aggregate``
are unordered), so this implements the classic two-pass distributed
scan, the same shape as the reference's ordered edge-stream fold
(torchtrajectory builds per-trajectory cumulative path lengths with a
sequential fold per partition after a range split; here the ranges are
doc_id spans):

1. **Pass 1 — per-range totals.**  One column-pruned streaming read of
   ``(doc_id, text)``; each batch bins its docs into K contiguous doc_id
   ranges (``np.searchsorted`` on the shared edge array) and emits K
   partial token sums.  The driver folds the tiny (K × n_blocks) partial
   table into K range totals — the ONLY driver-side state, independent
   of corpus size.
2. **Pass 2 — per-range offset tasks.**  The K range specs (lo, hi,
   exclusive prefix offset) become a K-block Dataset (``repartition(K)``
   — ``from_arrow`` alone is ONE block, see BASELINE.md); each task
   pushdown-reads ONLY its doc_id span, sorts locally, cumsums, and
   emits ``(doc_id, n_tokens, bin_id, offset_in_bin)``.  Output streams;
   no stage ever materializes the corpus.

At 100 TB: pass 1 is a single pruned scan; the driver holds K int64s;
pass 2's task memory is one range's rows.  K (``n_ranges``) scales with
input file count so ranges stay block-sized.

Tokenization matches the SQL oracle's ``string_split(text, ' ')``
exactly (same kernel as :func:`textstats.token_count`, oracle-gated).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _doc_files(sf_dir_or_path: str) -> list[str]:
    import os

    p = sf_dir_or_path
    if os.path.isdir(p) and not p.endswith(".parquet"):
        cand = os.path.join(p, "documents.parquet")
        p = cand if os.path.exists(cand) else p
    if os.path.isdir(p):
        return sorted(
            os.path.join(root, f)
            for root, _, names in os.walk(p)
            for f in names
            if f.endswith(".parquet")
        )
    return [p]


def _id_bounds(files: list[str]) -> tuple[int, int]:
    """Global [min, max] doc_id from parquet row-group statistics — a
    metadata-only read (no data pages touched)."""
    import pyarrow.parquet as pq

    lo, hi = None, None
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = idx["doc_id"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"{f}: doc_id row-group stats missing")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        raise ValueError("no row groups in input")
    return int(lo), int(hi)


class _PackRangeTask:
    """One doc_id range: pushdown read, local sort, cumsum from the
    range's exclusive prefix offset (the pair-verification read pattern,
    dedup._VerifyPairsTask)."""

    def __init__(self, files: list[str], budget: int):
        self.files = files
        self.budget = budget

    def __call__(self, specs: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        out = []
        for lo, hi, off in zip(
            specs["lo"].to_pylist(),
            specs["hi"].to_pylist(),
            specs["offset"].to_pylist(),
        ):
            tbl = pads.dataset(self.files, format="parquet").to_table(
                columns=["doc_id", "text"],
                filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi),
            )
            if tbl.num_rows == 0:
                continue
            ids = tbl["doc_id"].to_numpy().astype(np.int64)
            order = np.argsort(ids, kind="stable")
            n = (
                pc.list_value_length(pc.split_pattern(tbl["text"], " "))
                .cast(pa.int64())
                .to_numpy()
                .astype(np.int64)[order]
            )
            start = off + np.concatenate(([0], np.cumsum(n)[:-1]))
            out.append(
                pa.table(
                    {
                        "doc_id": pa.array(ids[order], pa.int64()),
                        "n_tokens": pa.array(n, pa.int64()),
                        "bin_id": pa.array(start // self.budget, pa.int64()),
                        "offset_in_bin": pa.array(start % self.budget, pa.int64()),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                    "offset_in_bin": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(out)


def pack_sequences(
    sf_dir: str, budget: int = 512, n_ranges: int | None = None
) -> ray.data.Dataset:
    """Per-doc packing offsets for a ``budget``-token concat-and-chunk
    stream in doc_id order: ``doc_id, n_tokens, bin_id, offset_in_bin``
    where ``bin_id = floor(start / budget)`` and ``start`` is the doc's
    exclusive prefix token sum."""
    files = _doc_files(sf_dir)
    if n_ranges is None:
        n_ranges = min(4096, max(16, 4 * len(files)))
    lo, hi = _id_bounds(files)
    # K+1 contiguous integer edges covering [lo, hi]; half-open ranges,
    # last edge hi+1 so the max id lands in range K-1
    edges = np.unique(
        np.linspace(lo, hi + 1, n_ranges + 1, dtype=np.int64)
    )
    k = len(edges) - 1

    def partial_sums(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        n = (
            pc.list_value_length(pc.split_pattern(batch["text"], " "))
            .cast(pa.int64())
            .to_numpy()
        )
        rid = np.searchsorted(edges, ids, side="right") - 1
        sums = np.bincount(rid, weights=n, minlength=k).astype(np.int64)
        return pa.table(
            {
                "range_id": pa.array(np.arange(k), pa.int64()),
                "toks": pa.array(sums, pa.int64()),
            }
        )

    partials = (
        ray.data.read_parquet(files, columns=["doc_id", "text"])
        .map_batches(partial_sums, batch_format="pyarrow")
        .to_pandas()  # K × n_blocks tiny rows — the scan's only sync point
    )
    totals = (
        partials.groupby("range_id")["toks"].sum().reindex(range(k), fill_value=0)
    )
    offsets = np.concatenate(([0], np.cumsum(totals.to_numpy())[:-1]))

    specs = pa.table(
        {
            "lo": pa.array(edges[:-1], pa.int64()),
            "hi": pa.array(edges[1:], pa.int64()),
            "offset": pa.array(offsets, pa.int64()),
        }
    )
    return (
        ray.data.from_arrow(specs)
        .repartition(k)
        .map_batches(
            _PackRangeTask(files, budget),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def bin_fill_stats(sf_dir: str, budget: int = 512) -> pd.DataFrame:
    """One-row packing audit: total tokens, number of bins, and mean
    fill of the non-final bins (always exactly ``budget`` by
    construction — the invariant a dataloader relies on)."""
    from ray.data.aggregate import Count, Sum

    agg = pack_sequences(sf_dir, budget=budget).aggregate(
        Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs")
    )
    total = int(agg["total_tokens"] or 0)
    return pd.DataFrame(
        [
            {
                "budget": budget,
                "total_tokens": total,
                "n_bins": -(-total // budget) if total else 0,
                "n_docs": int(agg["n_docs"]),
            }
        ]
    )


def chunk_documents(
    sf_dir: str, size: int = 16, stride: int = 12
) -> ray.data.Dataset:
    """Sliding-window document chunking (the long-context preprocessing
    pass): each doc emits windows of ``size`` tokens starting at
    multiples of ``stride`` — ``doc_id, chunk_id, start_tok, n_tokens,
    chunk_text`` (the final window may be shorter; a doc with ≤ size
    tokens emits exactly one window).

    Pure per-batch flat emission — no shuffle, no driver state; output
    rows stream.  Window starts and lengths are computed vectorized
    (counts → repeat/cumsum); only the final chunk-string slice is per
    OUTPUT row (O(output chars), the same cost class as tokenize).
    Mirrors the reference's sliding-window shape (W1) applied to token
    streams instead of time."""
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        tok_lists = [t.split(" ") for t in texts]
        n = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
        n_chunks = np.where(n <= size, 1, (n - size + stride - 1) // stride + 1)
        doc_idx = np.repeat(np.arange(len(ids)), n_chunks)
        # chunk_id = position within each doc's run
        starts_of_doc = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_id = np.arange(len(doc_idx)) - starts_of_doc[doc_idx]
        start_tok = chunk_id * stride
        n_tok = np.minimum(size, n[doc_idx] - start_tok)
        chunk_text = [
            " ".join(tok_lists[d][s : s + size])
            for d, s in zip(doc_idx, start_tok)
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "start_tok": pa.array(start_tok, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "chunk_text": pa.array(chunk_text, pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")
