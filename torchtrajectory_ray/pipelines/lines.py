"""Line-level boilerplate removal (the CCNet / RefinedWeb line-dedup
pass): drop every line whose exact text appears in ``min_df`` or more
DISTINCT documents — navigation bars, cookie banners, footers — and
reassemble the cleaned documents.

Shape at 100 TB (two streaming passes + one small broadcast):

1. **df pass** — one read; each batch splits its docs into lines,
   dedupes lines WITHIN each doc (df counts documents, not
   occurrences), and pre-aggregates (line, partial_count) before the
   shuffle, so the exchange moves at most one row per distinct line
   per block — a 256-way HASH exchange on the line's content hash
   (global df needs co-location, not order; nothing string-sorts the
   lines).  Only lines with df ≥ ``min_df`` leave the per-partition
   reduce — the boilerplate set, which is tiny relative to the
   corpus by construction (a line must repeat across documents to
   qualify).  A ``max_boilerplate`` cap fails loud instead of letting a
   degenerate corpus (every line shared) swamp the driver.
2. **scrub pass** — the boilerplate set is sorted once, shipped via
   ``ray.put``, and every batch drops matching lines with ONE
   vectorized ``np.searchsorted`` membership test, then reassembles
   ``"\\n".join``-ed cleaned text.  No shuffle; output streams.

Lines are compared as exact strings so the operator is oracle-gated
(DuckDB reproduces it with ``string_split(text, chr(10))`` + a df
join); a production variant would shuffle 8-byte line hashes instead of
line strings — the plumbing is identical (same note as
``decontaminate``).

The sf gate runs :func:`line_dedup`, which first appends two
deterministic footer lines per doc (``doc_id``-derived, mirrored in the
SQL oracle verbatim — the synthetic corpus has no newlines), so the
split / df-count / removal / reassembly chain is exercised on every
row, not vacuously.

Reference analog: the duplicate-segment suppression in the reference's
stitch dedup (SURVEY.md U6 family), re-targeted from trajectory
segments to text lines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def boilerplate_lines(
    docs: ray.data.Dataset, min_df: int = 2, max_boilerplate: int = 1_000_000
) -> np.ndarray:
    """Sorted array of lines appearing in ≥ ``min_df`` distinct docs of
    a ``(doc_id, text)`` dataset."""

    def partial(batch: pa.Table) -> pa.Table:
        per_doc: list[set[str]] = [
            set(t.split("\n")) for t in batch["text"].to_pylist()
        ]
        flat: list[str] = [ln for s in per_doc for ln in s]
        if not flat:
            return pa.table(
                {
                    "line": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                }
            )
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
        counts = np.bincount(codes)
        # hash-partition key: the global df of a line only needs its
        # rows CO-LOCATED, not ordered — a 256-way hash exchange on the
        # line's content hash replaces Ray's sort-based groupby over
        # the (potentially ~1 KB) line STRINGS.  The strings still ride
        # the exchange once (the surviving boilerplate text is the
        # output), but nothing string-sorts them, and the low-key-count
        # exchange skips the expensive boundary sampling.  Comparison
        # semantics stay exact-string (the hash only places rows).
        part = (
            pd.util.hash_array(uniq) & np.uint64(255)
        ).astype(np.int32)
        return pa.table(
            {
                "line": pa.array(uniq, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def df_filter(g: pd.DataFrame) -> pa.Table:
        df = g.groupby("line", sort=False)["n"].sum()
        # explicit Arrow string schema: an empty object-dtype pandas
        # frame trips Ray's block-size estimator (harmless but noisy)
        keep = df.index[df.to_numpy() >= min_df]
        return pa.table({"line": pa.array(list(keep), pa.string())})

    boiler = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_filter, batch_format="pandas")
        .to_pandas()
    )
    if len(boiler) > max_boilerplate:
        raise ValueError(
            f"boilerplate set has {len(boiler)} lines > cap {max_boilerplate}; "
            "the corpus is degenerate (or raise max_boilerplate)"
        )
    if boiler.empty:  # fully-empty Datasets lose their schema in pandas
        return np.asarray([], dtype=object)
    return np.sort(boiler["line"].to_numpy())


def line_dedup_ds(
    docs_factory,
    min_df: int = 2,
    max_boilerplate: int = 1_000_000,
) -> ray.data.Dataset:
    """Library form over any ``(doc_id, text)`` dataset:
    ``doc_id, n_lines, n_removed, text_clean`` where ``text_clean``
    keeps the doc's original line order with boilerplate occurrences
    removed ('' if nothing survives).  ``docs_factory`` is a zero-arg
    callable returning the dataset (the operator reads it twice — df
    pass and scrub pass — and a fresh Dataset per pass keeps both
    streaming instead of materializing one)."""
    ref = ray.put(boilerplate_lines(docs_factory(), min_df, max_boilerplate))

    def scrub(batch: pa.Table) -> pa.Table:
        boiler = ray.get(ref)
        texts = batch["text"].to_pylist()
        line_lists = [t.split("\n") for t in texts]
        n_lines = np.fromiter(
            (len(ls) for ls in line_lists), np.int64, len(line_lists)
        )
        flat = np.asarray(
            [ln for ls in line_lists for ln in ls], dtype=object
        )
        if boiler.size and flat.size:
            pos = np.searchsorted(boiler, flat)
            pos[pos == len(boiler)] = 0
            drop = boiler[pos] == flat
        else:
            drop = np.zeros(len(flat), bool)
        doc_idx = np.repeat(np.arange(len(line_lists)), n_lines)
        n_removed = np.bincount(
            doc_idx[drop], minlength=len(line_lists)
        ).astype(np.int64)
        cleaned = []
        off = 0
        for ls in line_lists:
            keep = ~drop[off : off + len(ls)]
            cleaned.append("\n".join(np.asarray(ls, dtype=object)[keep]))
            off += len(ls)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        )

    return docs_factory().map_batches(scrub, batch_format="pyarrow")


def _with_footers(batch: pa.Table) -> pa.Table:
    """Deterministic footer lines for the sf gate (mirrored in the SQL
    oracle verbatim): line 2 is shared by every 7th doc, line 3 by all."""
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    texts = [
        f"{t}\ncopyright footer {i % 7}\nnav menu home"
        for t, i in zip(batch["text"].to_pylist(), ids)
    ]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def line_dedup(sf_dir: str, min_df: int = 2) -> ray.data.Dataset:
    """Gate entry: footer-augmented docs through the line-dedup chain."""

    def docs() -> ray.data.Dataset:
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(_with_footers, batch_format="pyarrow")

    return line_dedup_ds(docs, min_df=min_df)
