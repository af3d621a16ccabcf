"""Deterministic synthetic web-page corpus + query set (FIXTURES.md).

Shape is exactly BASELINE.json's ``input_hint``:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.
Everything is a pure function of (seed, n_docs) — the pattern of the
reference's seeded synthetic-timestamp generator
(/root/reference/src/main/java/au/edu/rmit/bdm/Test.java:100-127).

The token stream is Zipf(s=1.1) over a 2,000-term vocabulary so head-term
skew (the analog of popular road edges with giant inverted lists,
SURVEY.md §4) is exercised even at test scale.  Planted needles support
exact-retrieval tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 2000
ZIPF_S = 1.1
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC in microseconds

NEEDLE_UNIQUE_DOC = 137
NEEDLE_PAIR_DOCS = (13, 4200)
NEEDLE_PHRASE_DOCS = (7, 77, 777)

_LANGS = ["en"] * 8 + ["pt", "de"]


def vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def _zipf_probs() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** (-ZIPF_S)
    return p / p.sum()


def doc_length(i: int) -> int:
    return 20 + (i * 31) % 381


def doc_tokens(i: int) -> list[str]:
    """Token list for doc i — independent of corpus size for i < n."""
    rng = np.random.default_rng(SEED + i)
    ids = rng.choice(VOCAB_SIZE, size=doc_length(i), p=_ZIPF_PROBS)
    toks = [_VOCAB[j] for j in ids]
    if i == NEEDLE_UNIQUE_DOC:
        toks[3:3] = ["needle_unique"]
    if i in NEEDLE_PAIR_DOCS:
        toks[1:1] = ["needle_pair"]
    if i in NEEDLE_PHRASE_DOCS:
        toks[5:5] = ["needle_phrase_a", "needle_phrase_b"]
    return toks


_VOCAB = vocab()
_ZIPF_PROBS = _zipf_probs()


_RICH_FILLER = (
    b'<div class="nav-main" role="navigation" data-x="%(i)d">'
    b"<script>(function(){var a=%(i)d;for(var j=0;j<10;j++){a+=j;}"
    b"window.__t=a;})();</script>"
    b"<style>.c%(i)d { margin: 0 auto; padding: 2px 4px; color: #333; }"
    b"@media (max-width: 600px) { .c%(i)d { display: none; } }</style>"
    b"<!-- rendered %(i)d :: boilerplate block; tracking-id=%(i)d -->"
    b'<ul class="menu"><li data-k="%(i)d"></li><li></li><li></li></ul>'
    b"</div>"
)


def make_html(i: int, text: str, *, style: str = "minimal") -> bytes:
    """Deterministic page wrapper.  style="rich" pads with Common-Crawl-
    realistic boilerplate (scripts/styles/comments/bare markup — all of it
    extraction-neutral, so ``extract_text(html) == text`` still holds
    byte-for-byte) giving ~8 KB pages where extraction compute dominates,
    like real web pages."""
    filler = b""
    if style == "rich":
        filler = _RICH_FILLER.replace(b"%(i)d", str(i).encode()) * 48
    return (
        b"<html><head><title>T%d</title>" % i
        + b"<script>var x = 1 < 2;</script><style>p { color: red }</style>"
        + b"</head><body>"
        + filler
        + b"<!-- comment --><p>"
        + text.encode("utf-8")
        + b"</p>"
        + filler
        + b"</body></html>"
    )


def webpages_table(n_docs: int, start: int = 0, *, style: str = "minimal") -> pa.Table:
    """Rows [start, start+n_docs) of the deterministic corpus."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, start + n_docs):
        text = " ".join(doc_tokens(i))
        urls.append(f"https://site{i % 97}.example/page/{i}")
        tss.append(EPOCH_US + i * 137_000_000)
        htmls.append(make_html(i, text, style=style))
        texts.append(text)
        langs.append(_LANGS[i % 10])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_webpages(
    out_dir: str, n_docs: int, num_files: int = 8, *, style: str = "minimal"
) -> list[str]:
    """Write the corpus as ``num_files`` parquet shards (idempotent cache).

    Shard i holds the contiguous doc range [i*per, ...) so any corpus size
    reuses the generator deterministically; returns the file paths.
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, f"_COMPLETE_{n_docs}_{num_files}_{style}")
    paths = [
        os.path.join(out_dir, f"webpages-{i:04d}.parquet") for i in range(num_files)
    ]
    if os.path.exists(marker):
        return paths
    bounds = np.linspace(0, n_docs, num_files + 1).astype(int)
    for i, path in enumerate(paths):
        tbl = webpages_table(
            int(bounds[i + 1] - bounds[i]), start=int(bounds[i]), style=style
        )
        pq.write_table(tbl, path + ".tmp")
        os.replace(path + ".tmp", path)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def dense_doc_id(i: int, n_docs: int, num_files: int) -> int:
    """The doc_id ``build_index`` assigns to corpus row ``i`` when built
    from ``write_webpages(n_docs, num_files)`` shards: file ordinal << 34
    plus row-within-file (see prepare_table's doc_id_base path)."""
    bounds = np.linspace(0, n_docs, num_files + 1).astype(int)
    f = int(np.searchsorted(bounds, i, side="right") - 1)
    return (f << 34) + (i - int(bounds[f]))


def query_set(n_queries: int = 50, n_docs: int = 5000) -> list[dict]:
    """Deterministic query workload (FIXTURES.md §3).

    Mix of head+tail terms, planted needles, and terms occurring in no doc
    (the empty-posting edge case, InvertedIndex.java:150-153).
    """
    rng = np.random.default_rng(SEED * 7)
    queries: list[dict] = []
    for qid in range(n_queries):
        n_terms = int(rng.integers(2, 7))
        head = _VOCAB[int(rng.integers(0, 20))]
        tail = [_VOCAB[int(rng.integers(20, VOCAB_SIZE))] for _ in range(n_terms - 1)]
        terms = [head] + tail
        if qid == 3:
            terms = ["needle_unique", _VOCAB[0]]
        elif qid == 4:
            terms = ["needle_pair"]
        elif qid in (10, 20, 30):
            terms = terms[:-1] + ["zzz_missing_term"]
        kind = ["topk", "or", "and"][qid % 3]
        q: dict = {"query_id": qid, "terms": terms, "kind": kind,
                   "ts_lo": None, "ts_hi": None, "lang": None}
        if qid % 5 == 1:
            lo = int(rng.integers(0, max(1, n_docs // 2)))
            hi = lo + int(rng.integers(n_docs // 4, n_docs))
            q["ts_lo"] = EPOCH_US + lo * 137_000_000
            q["ts_hi"] = EPOCH_US + hi * 137_000_000
        if qid % 10 == 7:
            q["lang"] = "en"
        queries.append(q)
    return queries


def write_warc(
    out_path: str, n_docs: int, start: int = 0, *, gzipped: bool = False
) -> str:
    """The deterministic corpus rows [start, start+n_docs) as ONE valid
    WARC/1.0 file of ``response`` records (HTTP message payloads) — the
    Common-Crawl shape, for exercising ``sources.warc`` end to end."""
    import gzip as _gzip
    from datetime import datetime, timezone

    tbl = webpages_table(n_docs, start)
    chunks = []
    for i in range(tbl.num_rows):
        url = tbl["url"][i].as_py()
        ts_us = tbl["warc_ts"][i].value
        html = tbl["html"][i].as_py()
        date = (
            datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ")
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + url.encode() + b"\r\n"
            + b"WARC-Date: " + date.encode() + b"\r\n"
            + b"WARC-Record-ID: <urn:uuid:" + str(start + i).encode() + b">\r\n"
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        chunks.append(head + http + b"\r\n\r\n")
    raw = b"".join(chunks)
    if gzipped:
        raw = _gzip.compress(raw)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path + ".tmp", "wb") as f:
        f.write(raw)
    os.replace(out_path + ".tmp", out_path)
    return out_path


def write_jsonl(
    out_path: str, n_docs: int, start: int = 0, *, with_html: bool = True
) -> str:
    """The deterministic corpus rows as JSONL (html base64 when
    ``with_html``), for exercising ``sources.jsonl``."""
    import base64
    import json as _json

    tbl = webpages_table(n_docs, start)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path + ".tmp", "w") as f:
        for i in range(tbl.num_rows):
            rec = {
                "url": tbl["url"][i].as_py(),
                "warc_ts": tbl["warc_ts"][i].value,
                "text": tbl["text"][i].as_py(),
                "lang": tbl["lang"][i].as_py(),
            }
            if with_html:
                rec["html"] = base64.b64encode(
                    tbl["html"][i].as_py()
                ).decode()
            f.write(_json.dumps(rec) + "\n")
    os.replace(out_path + ".tmp", out_path)
    return out_path


def write_csv(
    out_path: str,
    n_docs: int,
    start: int = 0,
    *,
    with_html: bool = True,
    delimiter: str = ",",
    gzipped: bool = False,
) -> str:
    """The deterministic corpus rows as CSV/TSV (html base64 in an
    ``html_b64`` column when ``with_html``), for ``sources.csvsrc``."""
    import base64
    import csv as _csv
    import gzip as _gzip
    import io as _io

    tbl = webpages_table(n_docs, start)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    buf = _io.StringIO()
    fields = ["url", "warc_ts", "text", "lang"] + (
        ["html_b64"] if with_html else []
    )
    w = _csv.DictWriter(buf, fieldnames=fields, delimiter=delimiter)
    w.writeheader()
    for i in range(tbl.num_rows):
        rec = {
            "url": tbl["url"][i].as_py(),
            "warc_ts": tbl["warc_ts"][i].value,
            "text": tbl["text"][i].as_py(),
            "lang": tbl["lang"][i].as_py(),
        }
        if with_html:
            rec["html_b64"] = base64.b64encode(tbl["html"][i].as_py()).decode()
        w.writerow(rec)
    data = buf.getvalue().encode("utf-8")
    if gzipped:
        data = _gzip.compress(data)
    with open(out_path + ".tmp", "wb") as f:
        f.write(data)
    os.replace(out_path + ".tmp", out_path)
    return out_path
