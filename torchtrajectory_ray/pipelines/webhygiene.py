"""URL hygiene for web-crawl corpora: canonicalization, re-crawl dedup,
per-domain stats, and host-blocklist filtering.

The standard first stage of a Common-Crawl-style pipeline (the reference's
ingest normalizes raw entries the same way — `TrajReader` drops malformed
rows and canonicalizes ids before anything else, reference
src/main/java/au/edu/rmit/bdm/Torch/base/db/TrajReader.java): before any
content-level dedup, crawls of the SAME page must collapse to one
canonical URL.  Rules implemented (the widely-published canonical set —
RFC 3986 normalization + tracking-parameter strips):

  * drop the fragment (``#...``)
  * lowercase the scheme and the authority (host[:port])
  * strip explicit default ports (``:443``, ``:80``)
  * drop ``utm_*`` tracking parameters (other params kept, order kept)
  * strip trailing slashes from the path (RFC-normalizing an empty path
    with a query to ``host/?q``)

Everything is zero-copy Arrow: the kernel is pure ``pyarrow.compute``
(RE2 regex + split/join kernels), no per-row Python anywhere — at
10^12 documents URL canonicalization is a hot full-corpus scan.

The sf ``documents`` table has no URL column, so the driver-facing
operators derive a deterministic MESSY crawl URL per doc_id (uppercase
hosts, :443 ports, utm params, fragments, trailing slashes, and a
//3 re-crawl collision so three doc_ids share each page).  The DuckDB
oracle reconstructs the CANONICAL form arithmetically from doc_id —
it never parses a URL — so the gate compares two independent
derivations: the string-parsing kernel here vs integer arithmetic.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# Hosts blocked by the (tiny, broadcast) blocklist operator.  At real
# scale this is a UT1-style list of ~1e6 hosts: small enough to ship to
# every task as a frozenset via ray.put, never a shuffle side.
BLOCKED_HOSTS = (
    "site13.example",
    "site29.example",
    "site61.example",
    "site83.example",
)

_N_URL_PARTS = 256


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized URL canonicalization (see module docstring for rules).

    Rows that are not absolute URLs (``scheme://...``) surface as NULLS —
    the kernel is TOTAL (hypothesis-gated): one junk row must never raise
    out of a 100-TB scan.  (``list_element`` RAISES on the 1-element split
    a scheme-less row produces, so ill-formed rows are nulled up front.)
    ~6 RE2 passes + 2 splits per batch, no Python per row.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ok = pc.match_substring_regex(urls, r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    urls = pc.if_else(
        pc.fill_null(ok, False), urls, pa.nulls(len(urls), pa.string())
    )
    u = pc.replace_substring_regex(urls, r"#.*$", "")  # fragment
    parts = pc.split_pattern(u, "://", max_splits=1)
    scheme = pc.utf8_lower(pc.list_element(parts, 0))
    rest = pc.list_element(parts, 1)
    # normalize "host?q" (query before any slash) to "host/?q", and
    # guarantee a "/" exists so the authority/path split is total
    rest = pc.replace_substring_regex(rest, r"^([^/?]*)\?", r"\1/?")
    rest = pc.if_else(
        pc.match_substring(rest, "/"),
        rest,
        pc.binary_join_element_wise(rest, "/", ""),
    )
    rp = pc.split_pattern(rest, "/", max_splits=1)
    auth = pc.utf8_lower(pc.list_element(rp, 0))
    auth = pc.replace_substring_regex(auth, r":(443|80)$", "")
    pathq = pc.list_element(rp, 1)
    # drop utm_* params; if the dropped param was first, promote the next
    # separator back to "?"
    pathq = pc.replace_substring_regex(pathq, r"[?&]utm_[^&]*", "")
    pathq = pc.replace_substring_regex(pathq, r"^([^?&]*)&", r"\1?")
    # trailing slash: before the query or at the end
    pathq = pc.replace_substring_regex(pathq, r"/+(\?)", r"\1")
    pathq = pc.replace_substring_regex(pathq, r"/+$", "")
    slash = pc.if_else(
        pc.equal(pathq, ""),
        pa.nulls(len(pathq), pa.string()).fill_null(""),
        pc.binary_join_element_wise(
            pa.nulls(len(pathq), pa.string()).fill_null("/"), pathq, ""
        ),
    )
    return pc.binary_join_element_wise(scheme, "://", auth, slash, "")


def with_canonical_urls(
    ds: ray.data.Dataset, url_col: str = "url", out_col: str = "canon_url"
) -> ray.data.Dataset:
    """Library-facing transform: append the canonical form of ``url_col``
    to any Dataset (e.g. a fixtures/WARC webpages table)."""

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, canonicalize_urls(batch[url_col]))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic messy-crawl synthesis (driver-gate harness)
# ---------------------------------------------------------------------------


def synthetic_crawl_urls(doc_ids: np.ndarray) -> pa.Array:
    """A messy crawl URL per doc_id, vectorized.  Three consecutive
    doc_ids are re-crawls of the SAME page (page = doc_id // 3): the
    page determines everything canonical (host, path, the kept ``id``
    param), while per-crawl modular branches add only NON-canonical
    noise — uppercase hosts, explicit :443 ports, trailing slashes,
    utm params and fragments — so canonicalization must collapse each
    page's crawls to one identical URL.  The DuckDB oracle reconstructs
    the CANONICAL target with pure integer arithmetic (no URL parsing).
    """
    i = doc_ids.astype(np.int64)
    p = i // 3
    site = (p % 97).astype("U3")
    page = p.astype("U20")
    host = np.where(
        i % 11 == 0,
        np.char.add(np.char.add("SITE", site), ".EXAMPLE"),
        np.char.add(np.char.add("site", site), ".example"),
    )
    port = np.where(i % 17 == 2, ":443", "")
    path = np.char.add("/page/", page)
    tslash = np.where(i % 19 == 4, "/", "")
    # query: a page-level kept param plus per-crawl utm noise, joined
    # with "&" only between the non-empty pieces
    kept = np.where(p % 4 == 1, np.char.add("id=", (p % 5).astype("U1")), "")
    utm1 = np.where(i % 7 == 3, "utm_source=feed", "")
    utm2 = np.where(i % 7 == 5, "utm_campaign=x", "")
    q = utm1
    q = np.char.add(np.char.add(q, np.where((q != "") & (kept != ""), "&", "")), kept)
    q = np.char.add(np.char.add(q, np.where((q != "") & (utm2 != ""), "&", "")), utm2)
    query = np.where(q != "", np.char.add("?", q), "")
    frag = np.where(i % 13 == 1, "#frag", "")
    out = np.char.add("https://", host)
    for piece in (port, path, tslash, query, frag):
        out = np.char.add(out, piece)
    return pa.array(out.tolist(), pa.string())


# SQL fragment the oracles share: the canonical URL from doc_id arithmetic
# (independent of the parsing kernel above).
CANON_SQL = (
    "('https://site' || ((doc_id // 3) % 97)::VARCHAR || '.example/page/' "
    "|| (doc_id // 3)::VARCHAR "
    "|| CASE WHEN (doc_id // 3) % 4 = 1 "
    "THEN '?id=' || ((doc_id // 3) % 5)::VARCHAR ELSE '' END)"
)
HOST_SQL = "('site' || ((doc_id // 3) % 97)::VARCHAR || '.example')"


def _read_ids(sf_dir: str, extra: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"] + (extra or [])
    )


def _with_canon(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_numpy()
    canon = canonicalize_urls(synthetic_crawl_urls(ids))
    return batch.append_column("canon_url", canon)


# ---------------------------------------------------------------------------
# driver-facing operators
# ---------------------------------------------------------------------------


def url_dedup(sf_dir: str) -> ray.data.Dataset:
    """Re-crawl dedup: one row per canonical URL keeping the LATEST crawl
    (max doc_id — ingest order is crawl order) plus the crawl count.

    Exchange shape mirrors ``textstats.exact_dedup``: each batch
    pre-reduces its own canon groups, then a 256-way hash exchange on the
    canonical URL's bytes co-locates groups without a global string sort.
    """

    def partials(batch: pa.Table) -> pa.Table:
        t = _with_canon(batch)
        ids = t["doc_id"].to_numpy()
        canon = np.asarray(t["canon_url"].to_pylist(), dtype=object)
        uniq, inv = np.unique(canon, return_inverse=True)
        latest = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(latest, inv, ids)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        # crc32 is process-independent (str hash() is salted per worker
        # and would split a page's rows across parts)
        part = np.fromiter(
            (zlib.crc32(s.encode()) % _N_URL_PARTS for s in uniq),
            np.int64,
            len(uniq),
        )
        return pa.table(
            {
                "canon_url": pa.array(list(uniq), pa.string()),
                "doc_id": pa.array(latest, pa.int64()),
                "n_crawls": pa.array(n, pa.int64()),
                "part": pa.array(part % _N_URL_PARTS, pa.int32()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("canon_url", sort=False).agg(
            doc_id=("doc_id", "max"), n_crawls=("n_crawls", "sum")
        )
        return out.reset_index()

    return (
        _read_ids(sf_dir)
        .map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
        .select_columns(["canon_url", "doc_id", "n_crawls"])
    )


def domain_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-host crawl stats: total crawled docs, DISTINCT canonical pages,
    and total extracted chars.

    Scale shape: batch partials keyed by (host, canon) → 256-way hash
    exchange on the canonical URL (so each page's rows land in ONE part)
    → per-part fold to ONE row per host → the final groupby moves at most
    parts × hosts tiny rows.

    Raw corpora without a precomputed ``n_chars`` column (e.g. the soak
    shards) fall back to ``utf8_length(text)`` inside the batch."""
    import pyarrow.dataset as pds

    has_chars = "n_chars" in pds.dataset(
        f"{sf_dir}/documents.parquet"
    ).schema.names

    def partials(batch: pa.Table) -> pa.Table:
        t = _with_canon(batch)
        canon = np.asarray(t["canon_url"].to_pylist(), dtype=object)
        chars = (
            t["n_chars"].to_numpy()
            if has_chars
            else pc.utf8_length(t["text"]).to_numpy().astype(np.int64)
        )
        uniq, inv = np.unique(canon, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        csum = np.zeros(len(uniq), np.int64)
        np.add.at(csum, inv, chars)
        part = np.fromiter(
            (zlib.crc32(s.encode()) % _N_URL_PARTS for s in uniq),
            np.int64,
            len(uniq),
        )
        return pa.table(
            {
                "canon_url": pa.array(list(uniq), pa.string()),
                "n_docs": pa.array(n, pa.int64()),
                "total_chars": pa.array(csum, pa.int64()),
                "part": pa.array(part % _N_URL_PARTS, pa.int32()),
            }
        )

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        per_page = g.groupby("canon_url", sort=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
        )
        host = per_page.index.str.split("/").str[2]
        out = per_page.groupby(host.values).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
        )
        out["n_pages"] = per_page.groupby(host.values).size()
        return out.rename_axis("host").reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("host", sort=False).agg(
            n_docs=("n_docs", "sum"),
            n_pages=("n_pages", "sum"),
            total_chars=("total_chars", "sum"),
        )
        return out.reset_index()

    return (
        _read_ids(sf_dir, ["n_chars"] if has_chars else ["text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_part, batch_format="pandas")
        .groupby("host")
        .map_groups(final, batch_format="pandas")
        .select_columns(["host", "n_docs", "n_pages", "total_chars"])
    )


def blocklist_summary(sf_dir: str) -> ray.data.Dataset:
    """Host-blocklist filter audit: per lang, docs kept vs blocked.

    The blocklist rides into every task as a tiny frozenset (the
    broadcast-small-side rule); the filter itself is one vectorized
    ``isin`` per batch.  Counting BOTH sides gates keep and drop."""
    blocked = frozenset(BLOCKED_HOSTS)

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        site = (ids // 3) % 97
        is_blocked = np.isin(
            site,
            np.array(
                [int(h.split(".")[0][4:]) for h in sorted(blocked)], np.int64
            ),
        )
        # derive the host through the PARSING kernel so the gate still
        # exercises it (the oracle derives arithmetically)
        canon = canonicalize_urls(synthetic_crawl_urls(ids)).to_pylist()
        hosts = np.asarray([c.split("/")[2] for c in canon], dtype=object)
        kernel_blocked = np.fromiter(
            (h in blocked for h in hosts), bool, len(hosts)
        )
        if not np.array_equal(is_blocked, kernel_blocked):
            raise AssertionError("kernel host != arithmetic host")
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        df = pd.DataFrame(
            {"lang": lang, "blocked": kernel_blocked.astype(np.int64)}
        )
        out = df.groupby("lang", sort=False).agg(
            n_blocked=("blocked", "sum"), n=("blocked", "size")
        )
        out["n_kept"] = out.pop("n") - out["n_blocked"]
        return pa.Table.from_pandas(out.reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("lang", sort=False)
            .agg(n_kept=("n_kept", "sum"), n_blocked=("n_blocked", "sum"))
            .reset_index()
        )

    return (
        _read_ids(sf_dir, ["lang"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
        .select_columns(["lang", "n_kept", "n_blocked"])
    )
