"""PII scrubbing: redact e-mail addresses, phone numbers, and IPv4
addresses from a text column with compiled regexes (the standard
C4/RefinedWeb hygiene pass before training).

Shape: a pure ``map_batches`` stream — patterns are compiled ONCE at
module import (each worker process pays compilation once, the
module-singleton discipline used by ``lang_id``), the regex engine is
the kernel, and nothing shuffles or materializes.  Patterns are kept
RE2-compatible (no backreferences / lookarounds) so the operator is
oracle-gated: DuckDB's ``regexp_replace(..., 'g')`` applies the SAME
pattern strings.  Replacement order is fixed (EMAIL → IPV4 → PHONE) so
earlier redactions cannot feed later patterns on either side.

The sf gate runs :func:`pii_scrub`, which first derives a deterministic
pii-bearing suffix from ``doc_id`` (the synthetic corpus contains no
PII) — the SQL oracle constructs the identical suffix, so redaction is
exercised on every row, not vacuously.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data

# RE2-safe (DuckDB) AND Python-re equivalent pattern strings.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_PAT = r"\+?\d[\d-]{7,}\d"

# (name, compiled, replacement) — applied in this order on both sides
_RULES = [
    ("n_emails", re.compile(EMAIL_PAT), "<EMAIL>"),
    ("n_ips", re.compile(IPV4_PAT), "<IP>"),
    ("n_phones", re.compile(PHONE_PAT), "<PHONE>"),
]


def scrub_batch(texts: list[str]) -> dict[str, object]:
    """Redact one batch; returns scrubbed texts + per-rule counts."""
    n = len(texts)
    counts = {name: np.zeros(n, np.int64) for name, _, _ in _RULES}
    out = list(texts)
    for name, pat, rep in _RULES:
        for i, t in enumerate(out):
            out[i], k = pat.subn(rep, t)
            counts[name][i] = k
    return {"texts": out, **counts}


def scrub_text(
    ds: ray.data.Dataset, column: str = "text"
) -> ray.data.Dataset:
    """Library form: replace ``column`` with its scrubbed text and
    append ``n_emails, n_ips, n_phones`` count columns."""

    def f(batch: pa.Table) -> pa.Table:
        r = scrub_batch(batch[column].to_pylist())
        idx = batch.schema.get_field_index(column)
        batch = batch.set_column(idx, column, pa.array(r["texts"], pa.string()))
        for name, _, _ in _RULES:
            batch = batch.append_column(name, pa.array(r[name], pa.int64()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def _derive_pii(ids: np.ndarray, texts: list[str]) -> list[str]:
    """Deterministic pii-bearing suffix for the sf gate (mirrored in the
    SQL oracle verbatim)."""
    return [
        f"{t} reach user{i}@mail.example or +1-555-{i % 10000:04d} "
        f"at 10.{i % 256}.{(i // 7) % 256}.{i % 200 + 1}"
        for t, i in zip(texts, ids)
    ]


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """Gate entry: derive pii-bearing text per doc, scrub it, return
    ``doc_id, n_emails, n_ips, n_phones, text_scrubbed``."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        raw = _derive_pii(ids, batch["text"].to_pylist())
        r = scrub_batch(raw)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_emails": pa.array(r["n_emails"], pa.int64()),
                "n_ips": pa.array(r["n_ips"], pa.int64()),
                "n_phones": pa.array(r["n_phones"], pa.int64()),
                "text_scrubbed": pa.array(r["texts"], pa.string()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")
