"""Text-analysis pipelines over a documents table (doc_id, text, lang, ...).

Training-data-pipeline operators: token counting, quality scoring,
exact dedup, per-language counts, corpus stats.  All are vectorized
``map_batches`` transforms; the wide steps pre-aggregate per batch before
the (small) groupby, per the aggregation-at-scale pattern.

Tokenization here is ``split on single space`` (pyarrow ``split_pattern``)
— on the synthetic corpora this equals the engine tokenizer and the
DuckDB oracle's ``string_split(text, ' ')`` exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Min, Sum

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens — zero-copy Arrow kernel (split + list_value_length)."""

    def f(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": n.cast(pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def doc_stats(sf_dir: str) -> pd.DataFrame:
    """Global corpus stats (analog of the reference's global bounding-box
    aggregate, VertexGridIndex.java:78-99): n_docs, avgdl."""
    agg = token_count(sf_dir).aggregate(
        Count(alias_name="n_docs"), Mean("n_tokens", alias_name="avgdl")
    )
    return pd.DataFrame(
        [{"n_docs": int(agg["n_docs"]), "avgdl": round(float(agg["avgdl"]), 6)}]
    )


def lang_count(sf_dir: str) -> ray.data.Dataset:
    """lang, n — the language-filter statistic (predicate analog M7)."""
    return (
        _read_docs(sf_dir, ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
    )


def quality_score(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality features: n_tokens, n_uniq, stop_ratio,
    avg_token_len.  Flatten + factorize vectorization (same pattern as the
    index build's TokenizeCombine)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tok_lists = [t.split(" ") for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
        import itertools

        total = int(counts.sum())
        flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
        doc_idx = np.repeat(np.arange(len(tok_lists)), counts)
        codes, uniq = pd.factorize(flat, sort=False)
        # distinct terms per doc
        key = doc_idx * len(uniq) + codes
        uk = np.unique(key)
        n_uniq = np.bincount((uk // len(uniq)).astype(np.int64), minlength=len(tok_lists))
        # stopword occurrences per doc
        stop_codes = {i for i, t in enumerate(uniq) if t in STOPWORDS}
        is_stop = np.isin(codes, list(stop_codes)) if stop_codes else np.zeros(total, bool)
        n_stop = np.bincount(doc_idx, weights=is_stop, minlength=len(tok_lists))
        text_len = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        # same closed form as the SQL oracle: tokens are single-space joined
        avg_tok = (text_len - (counts - 1)) / counts
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(counts, pa.int64()),
                "n_uniq": pa.array(n_uniq.astype(np.int64), pa.int64()),
                "stop_ratio": pa.array(np.round(n_stop / counts, 6)),
                "avg_token_len": pa.array(np.round(avg_tok, 6)),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-doc within-document repetition signals (the Gopher-rule
    family): ``top_bigram_frac`` (most frequent bigram's share of all
    bigram occurrences) and ``dup_bigram_frac`` (share of occurrences
    that are repeats of an earlier bigram).  Docs need ≥ 2 tokens.

    One flatten-factorize pass per batch, no Python per-doc loop: the
    bigram strings come from one vectorized object-array concat, and all
    per-doc reductions are bincount/unique over composite keys (the
    quality_score pattern)."""

    def f(batch: pa.Table) -> pa.Table:
        import itertools

        texts = batch["text"].to_pylist()
        tok_lists = [t.split(" ") for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
        total = int(counts.sum())
        flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
        doc_idx = np.repeat(np.arange(len(tok_lists)), counts)
        # adjacent-position bigrams, masked where the doc changes
        ok = doc_idx[:-1] == doc_idx[1:]
        bigrams = flat[:-1][ok] + " " + flat[1:][ok]
        bdoc = doc_idx[:-1][ok]
        keep = counts >= 2
        if bigrams.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "top_bigram_frac": pa.array([], pa.float64()),
                    "dup_bigram_frac": pa.array([], pa.float64()),
                }
            )
        codes, uniq = pd.factorize(bigrams, sort=False)
        key = bdoc * len(uniq) + codes
        uk, freq = np.unique(key, return_counts=True)
        udoc = (uk // len(uniq)).astype(np.int64)
        n_docs = len(tok_lists)
        top = np.zeros(n_docs, np.int64)
        np.maximum.at(top, udoc, freq)
        distinct = np.bincount(udoc, minlength=n_docs)
        tot_bi = np.bincount(bdoc, minlength=n_docs).astype(np.float64)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            topf = np.round(top / tot_bi, 6)
            dupf = np.round(1.0 - distinct / tot_bi, 6)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "top_bigram_frac": pa.array(topf[keep], pa.float64()),
                "dup_bigram_frac": pa.array(dupf[keep], pa.float64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def text_sha1(batch: pa.Table) -> pa.Table:
    sha = [
        hashlib.sha1(t.encode("utf-8")).hexdigest()
        for t in batch["text"].to_pylist()
    ]
    return batch.append_column("text_sha", pa.array(sha, pa.string()))


_N_SHA_PARTS = 256


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact duplicate groups: keep the min doc_id per distinct text +
    group size (hash-partition + per-group first — U5's
    `groupby(key).first()` shape at scale: the shuffle key is the content
    hash, never the text itself).

    Exchange shape: the global (min, count) per sha only needs the
    sha's rows CO-LOCATED, not globally ORDERED — a 256-way hash
    exchange on the sha's leading bits replaces the sort-based
    ``groupby("text_sha")`` over N 40-byte hex strings (the kgram
    lesson: Ray's sort groupby pays boundary sampling + a full string
    sort for ordering nobody consumes).  Each batch pre-aggregates its
    own duplicates first, so the exchange carries one row per distinct
    sha per batch."""

    def sha_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sha = np.array(
            [
                hashlib.sha1(t.encode("utf-8")).digest()
                for t in batch["text"].to_pylist()
            ],
            dtype=object,
        )
        uniq, inv = np.unique(sha, return_inverse=True)
        min_id = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(min_id, inv, ids)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        part = np.fromiter(
            (s[0] for s in uniq), np.uint8, len(uniq)
        ).astype(np.int32) % _N_SHA_PARTS
        return pa.table(
            {
                "sha": pa.array(list(uniq), pa.binary(20)),
                "doc_id": pa.array(min_id, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("sha", sort=False).agg(
            doc_id=("doc_id", "min"), n_dups=("n", "sum")
        )
        return out.reset_index(drop=True)

    return (
        _read_docs(sf_dir, ["doc_id", "text"])
        .map_batches(sha_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
    )


_BPE_RE = None


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_bpe_tokens — GPT-2-style pretokenizer regex count (the
    BPE-ish token counting op; regex compiled once per worker process).
    On the single-spaced synthetic corpora every " word" is one
    pretoken, so the DuckDB oracle is len(string_split(text, ' '))."""

    def f(batch: pa.Table) -> pa.Table:
        global _BPE_RE
        if _BPE_RE is None:
            import re

            _BPE_RE = re.compile(
                r"'(?:[sdmt]|ll|ve|re)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+"
            )
        n = [
            len(_BPE_RE.findall(t)) for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": pa.array(n, pa.int64())}
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


# public-knowledge top character trigrams per language (space-padded),
# the classic Cavnar-Trenkle n-gram profile shape, truncated hard
_LANG_TRIGRAMS = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "de": ("er ", " de", "der", "ie ", " di", "die", "en ", "ein", "ch ", "sch"),
    "pt": (" de", "de ", " qu", "que", "ão ", " co", "os ", "as ", " es", "ent"),
    "fr": (" de", "de ", " le", "le ", "es ", " la", "la ", "ent", " et", "et "),
    "es": (" de", "de ", " la", "la ", " qu", "que", "el ", " el", "os ", "ión"),
}


def _tri_code(tri: str) -> int:
    """3 codepoints → one int64 (21 bits each; unicode max is 2^21)."""
    a, b, c = (ord(ch) for ch in tri)
    return (a << 42) | (b << 21) | c


class LangId:
    """Actor-pool stage: n-gram-profile language ID.  Profiles are built
    once per actor in __init__ (the load-once pattern) as sorted int64
    trigram-code arrays; the batch is classified in ONE numpy pass — all
    padded texts are concatenated to a codepoint array, every trigram
    window becomes an int64 code, and per-(doc, lang) hit counts fall out
    of isin + bincount.  No per-doc Python loop (r2 verdict item 7).
    Docs matching no profile (e.g. the synthetic token corpus) get
    'und'."""

    MIN_HITS = 2

    def __init__(self):
        self.langs = list(_LANG_TRIGRAMS)
        self.codes = [
            np.sort(np.array([_tri_code(t) for t in _LANG_TRIGRAMS[lang]], np.int64))
            for lang in self.langs
        ]

    def classify(self, text: str) -> str:
        """Scalar reference implementation (golden-tested against the
        vectorized batch path; kept for single-doc callers)."""
        t = f" {text.lower()} "
        tris = [t[i : i + 3] for i in range(len(t) - 2)]
        best, best_hits = "und", 0
        for lang, prof in _LANG_TRIGRAMS.items():
            hits = sum(1 for tr in tris if tr in prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits >= self.MIN_HITS else "und"

    def classify_batch(self, texts: list[str]) -> list[str]:
        n_docs = len(texts)
        if n_docs == 0:
            return []
        padded = [f" {t.lower()} " for t in texts]
        lens = np.fromiter((len(t) for t in padded), np.int64, n_docs)
        big = np.frombuffer(
            "".join(padded).encode("utf-32-le"), np.uint32
        ).astype(np.int64)
        starts = np.cumsum(lens) - lens
        n_tri = np.maximum(lens - 2, 0)
        total = int(n_tri.sum())
        if total == 0:
            return ["und"] * n_docs
        # window start positions, never crossing doc boundaries
        cum = np.cumsum(n_tri) - n_tri
        ar = np.arange(total) - np.repeat(cum, n_tri)
        pos = np.repeat(starts, n_tri) + ar
        tri = (big[pos] << 42) | (big[pos + 1] << 21) | big[pos + 2]
        doc_of = np.repeat(np.arange(n_docs), n_tri)
        hits = np.empty((n_docs, len(self.langs)), np.int64)
        for li, codes in enumerate(self.codes):
            member = np.isin(tri, codes)
            hits[:, li] = np.bincount(doc_of, weights=member, minlength=n_docs)
        # first-max-in-profile-order wins — the scalar loop's tie rule
        best = np.argmax(hits, axis=1)
        best_hits = hits[np.arange(n_docs), best]
        return [
            self.langs[b] if h >= self.MIN_HITS else "und"
            for b, h in zip(best, best_hits)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = self.classify_batch(batch["text"].to_pylist())
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())}
        )


_LANGID_SINGLETON: list = []


def _lang_id_task(batch: pa.Table) -> pa.Table:
    # module-level singleton: profile arrays build once per worker
    # PROCESS (the load-once pattern) without paying actor-pool spin-up
    # (~1 s/actor), which dominated this short pipeline as an actor stage
    if not _LANGID_SINGLETON:
        _LANGID_SINGLETON.append(LangId())
    return _LANGID_SINGLETON[0](batch)


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """doc_id, lang_pred — heuristic n-gram language ID (task pool,
    one-numpy-pass batch classifier)."""
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _lang_id_task, batch_format="pyarrow"
    )


def _bigram_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial bigram counts — one factorize over all bigram
    strings per batch (the same flatten + combine shape as the index
    tokenizer), no per-token Python dict loop.  Shared by
    ``top_bigrams`` and ``bigram_pmi``."""
    import itertools

    texts = batch["text"].to_pylist()
    tok_lists = [t.split(" ") for t in texts]
    counts = np.fromiter(
        (max(len(t) - 1, 0) for t in tok_lists), np.int64, len(tok_lists)
    )
    total = int(counts.sum())
    if total == 0:
        return pa.table(
            {
                "bigram": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
    flat = np.fromiter(
        itertools.chain.from_iterable(
            (f"{a} {b}" for a, b in zip(t, t[1:])) for t in tok_lists
        ),
        object,
        total,
    )
    codes, uniq = pd.factorize(flat, sort=False)
    n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    # hash-partition key: all global counting/top-k over bigrams only
    # needs each bigram's rows CO-LOCATED — the consumers run a 256-way
    # hash exchange instead of a sort groupby over bigram STRINGS, and
    # because partitions are DISJOINT by bigram, per-partition exact
    # top-k under the same strict total order (n desc, bigram asc) is
    # globally exact: a global top-k row ranks at least as high inside
    # its own partition.
    part = (pd.util.hash_array(uniq) & np.uint64(255)).astype(np.int32)
    return pa.table(
        {
            "bigram": pa.array(uniq, pa.string()),
            "n": pa.array(n, pa.int64()),
            "part": pa.array(part, pa.int32()),
        }
    )


def _bigram_sum_part(g: pd.DataFrame) -> pa.Table:
    """One hash partition of bigram partials → one exact (bigram, n)
    row per distinct bigram (the distributed reduced table)."""
    s = g.groupby("bigram", sort=False)["n"].sum()
    return pa.table(
        {
            "bigram": pa.array(list(s.index), pa.string()),
            "n": pa.array(s.to_numpy(np.int64), pa.int64()),
        }
    )


def top_bigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """bigram, n — corpus-wide top-k token bigrams: vectorized bigram
    explode per batch + in-batch partial counts, 256-way hash exchange,
    EXACT per-partition top-k (partitions are disjoint by bigram — see
    ``_bigram_partial``), driver merge of ≤ 256·k rows.  The full
    reduced bigram table never reaches the driver."""

    def topk_in_part(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("bigram", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "bigram"], ascending=[False, True]).head(k)
        return pa.table(
            {
                "bigram": pa.array(list(s["bigram"]), pa.string()),
                "n": pa.array(s["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    agg = (
        _read_docs(sf_dir, ["text"])
        .map_batches(_bigram_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk_in_part, batch_format="pandas")
        .to_pandas()
    )
    agg = agg.sort_values(["n", "bigram"], ascending=[False, True]).head(k)
    agg["rank"] = np.arange(1, len(agg) + 1, dtype=np.int64)
    return agg[["rank", "bigram", "n"]].reset_index(drop=True)


def bigram_pmi(sf_dir: str, k: int = 20, min_n: int = 5) -> pd.DataFrame:
    """rank, bigram, n, pmi — the top-``k`` token bigrams by pointwise
    mutual information ``pmi = ln(n(x,y)·T / (n(x,·)·n(·,y)))`` with
    marginals taken over the bigram table itself (T = total bigram
    occurrences); bigrams rarer than ``min_n`` are dropped (PMI's
    low-count pathology).  rank is (pmi desc, bigram asc) on the
    6-dp-rounded score.

    Distribution shape: the bigram table reuses ``top_bigrams``'
    partial-counts shuffle and is materialized once in its REDUCED form
    (one row per distinct bigram); both marginals come from ONE more
    pre-aggregated groupby over it (x and y factorized together, one
    exchange row per distinct token per block); the vocab-sized marginal
    table broadcasts via ``ray.put`` and the final PMI scan is
    embarrassingly parallel with per-block partial top-k — only ``k``
    rows per block reach the driver."""
    import ray as _ray

    bg = (
        _read_docs(sf_dir, ["text"])
        .map_batches(_bigram_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_bigram_sum_part, batch_format="pandas")
        .materialize()  # the reduced table feeds two consumers below
    )

    def marg(batch: pa.Table) -> pa.Table:
        b = batch["bigram"].to_pylist()
        n = batch["n"].to_numpy().astype(np.int64)
        xs = np.asarray([s.split(" ", 1)[0] for s in b], object)
        ys = np.asarray([s.split(" ", 1)[1] for s in b], object)
        codes, uniq = pd.factorize(np.concatenate([xs, ys]), sort=False)
        m = len(b)
        lx = np.zeros(len(uniq), np.int64)
        ry = np.zeros(len(uniq), np.int64)
        np.add.at(lx, codes[:m], n)
        np.add.at(ry, codes[m:], n)
        tpart = (pd.util.hash_array(uniq) & np.uint64(255)).astype(np.int32)
        return pa.table(
            {
                "tok": pa.array(uniq, pa.string()),
                "lx": pa.array(lx, pa.int64()),
                "ry": pa.array(ry, pa.int64()),
                "tpart": pa.array(tpart, pa.int32()),
            }
        )

    def marg_sum_part(g: pd.DataFrame) -> pa.Table:
        s = g.groupby("tok", sort=False)[["lx", "ry"]].sum().reset_index()
        return pa.table(
            {
                "tok": pa.array(list(s["tok"]), pa.string()),
                "lx": pa.array(s["lx"].to_numpy(np.int64), pa.int64()),
                "ry": pa.array(s["ry"].to_numpy(np.int64), pa.int64()),
            }
        )

    m = (
        bg.map_batches(marg, batch_format="pyarrow")
        .groupby("tpart")
        .map_groups(marg_sum_part, batch_format="pandas")
        .to_pandas()  # vocab-sized (same order as the term dictionary)
    )
    total = float(m["lx"].sum())  # == total bigram occurrences
    left = dict(zip(m["tok"], m["lx"].astype(np.int64)))
    right = dict(zip(m["tok"], m["ry"].astype(np.int64)))
    ref = _ray.put((left, right, total))

    empty = pa.table(
        {
            "bigram": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )

    def pmi_part(batch: pa.Table) -> pa.Table:
        L, R, T = _ray.get(ref)
        b = np.asarray(batch["bigram"].to_pylist(), object)
        n = batch["n"].to_numpy().astype(np.int64)
        keep = n >= min_n
        b, n = b[keep], n[keep]
        if not len(b):
            return empty
        lx = np.asarray([L[s.split(" ", 1)[0]] for s in b], np.float64)
        ry = np.asarray([R[s.split(" ", 1)[1]] for s in b], np.float64)
        pmi = np.round(np.log(n * T / (lx * ry)), 6)
        sel = np.lexsort((b, -pmi))[:k]  # per-block partial top-k
        return pa.table(
            {
                "bigram": pa.array(b[sel], pa.string()),
                "n": pa.array(n[sel], pa.int64()),
                "pmi": pa.array(pmi[sel], pa.float64()),
            }
        )

    parts = bg.map_batches(pmi_part, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(
        ["pmi", "bigram"], ascending=[False, True]
    ).head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts[["rank", "bigram", "n", "pmi"]].reset_index(drop=True)


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """doc_id, fingerprint — order-sensitive rolling-hash content id
    (document fingerprinting; see dedup.fingerprints)."""
    from torchtrajectory_ray.pipelines.dedup import fingerprints as _fp

    return _fp(sf_dir)


def source_doc_count(sf_dir: str) -> ray.data.Dataset:
    """Docs + total tokens per source — a pre-aggregated two-key groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " ")).cast(
            pa.int64()
        )
        df = pa.table(
            {"source": batch["source"], "n_tokens": n}
        ).to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


# Domain-level quality gate (the RefinedWeb-style whole-source drop):
# a source is kept when its docs average enough stopword density (webby
# prose) AND enough length.  Fixed constants — part of the operator's
# contract, re-expressed verbatim in the SQL oracle.
SOURCE_MIN_STOP = 0.055
SOURCE_MIN_TOKENS = 30.0


def _per_doc_stop_ratio(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, stop_ratio) per doc — flatten + is_in + bincount, no
    Python per-doc loop."""
    toks = pc.split_pattern(batch["text"], " ")
    n = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))).to_numpy(
        zero_copy_only=False
    )
    doc_idx = np.repeat(np.arange(len(n)), n)
    n_stop = np.bincount(doc_idx, weights=is_stop, minlength=len(n))
    return n, n_stop / n


def source_quality(sf_dir: str) -> ray.data.Dataset:
    """Per-source quality verdict: source, n_docs, mean_stop, mean_toks,
    kept.  Partial sums per batch (the exchange carries one row per
    source per batch, never per doc), one small groupby over sources,
    then the threshold verdict — at 10^12 docs the shuffle is bounded by
    #domains × #blocks."""

    def partial(batch: pa.Table) -> pa.Table:
        n, sr = _per_doc_stop_ratio(batch)
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "n": n,
                "sr": sr,
            }
        )
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n", "size"), sum_toks=("n", "sum"), sum_sr=("sr", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def verdict(batch: pa.Table) -> pa.Table:
        n = batch["n_docs"].to_numpy().astype(np.float64)
        mean_stop = batch["sum_sr"].to_numpy() / n
        mean_toks = batch["sum_toks"].to_numpy() / n
        kept = (mean_stop >= SOURCE_MIN_STOP) & (mean_toks >= SOURCE_MIN_TOKENS)
        return pa.table(
            {
                "source": batch["source"],
                "n_docs": batch["n_docs"],
                "mean_stop": pa.array(np.round(mean_stop, 6), pa.float64()),
                "mean_toks": pa.array(np.round(mean_toks, 6), pa.float64()),
                "kept": pa.array(kept, pa.bool_()),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_toks", alias_name="sum_toks"),
            Sum("sum_sr", alias_name="sum_sr"),
        )
        .map_batches(verdict, batch_format="pyarrow")
    )


def source_filtered(sf_dir: str) -> ray.data.Dataset:
    """doc_id of every doc in a kept source — the gate applied.  The
    kept-source set is tiny (one row per domain), so it rides into the
    filter task as a broadcast value set, not a shuffle join."""
    verdicts = source_quality(sf_dir).to_pandas()
    kept = pa.array(sorted(verdicts.loc[verdicts["kept"], "source"]))

    def gate(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["source"], value_set=kept)
        return batch.filter(m).select(["doc_id"])

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(gate, batch_format="pyarrow")


def length_quantile_thresholds(
    ds: ray.data.Dataset, probs: list[float]
) -> np.ndarray:
    """EXACT discrete quantiles of a ``(n_tokens,)`` dataset computed
    from its value histogram — the distributed form of
    ``quantile_disc`` (same index convention: the sorted element at
    ``ceil(p·n) − 1``, float ``p``).  One tiny ``groupby(n_tokens)``
    shuffle (distinct lengths, not rows) replaces a global sort: the
    histogram is exact because token counts are small integers, so the
    driver reduction is O(distinct lengths) regardless of corpus size."""

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(batch["n_tokens"].to_numpy(), return_counts=True)
        return pa.table(
            {
                "n_tokens": pa.array(v.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("n_tokens")
    )
    lens = hist["n_tokens"].to_numpy()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return np.zeros(0, np.int64)
    # DuckDB-compatible double arithmetic for the rank, then the first
    # length whose cumulative count reaches it
    ranks = np.ceil(np.asarray(probs, np.float64) * n).astype(np.int64)
    return lens[np.searchsorted(cum, ranks, side="left")].astype(np.int64)


def length_deciles(sf_dir: str) -> ray.data.Dataset:
    """doc_id, n_tokens, decile — each doc's token-length decile bucket
    (``decile = #{decile thresholds < n_tokens}``, 0..9), the
    length-balanced-sampling primitive.  Two streaming passes: the
    exact histogram quantiles above, then a broadcast-thresholds
    ``searchsorted`` assignment — no sort, no row shuffle."""
    import ray as _ray

    def to_len(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(batch["text"], " "))
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": n.cast(pa.int64())}
        )

    def lens_ds() -> ray.data.Dataset:
        return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
            to_len, batch_format="pyarrow"
        )

    thr = length_quantile_thresholds(
        lens_ds(), [k / 10 for k in range(1, 10)]
    )
    ref = _ray.put(np.sort(thr))

    def assign(batch: pa.Table) -> pa.Table:
        t = _ray.get(ref)
        n = batch["n_tokens"].to_numpy()
        dec = np.searchsorted(t, n, side="left")  # == #{thr < n}
        return batch.append_column(
            "decile", pa.array(dec.astype(np.int64), pa.int64())
        )

    return lens_ds().map_batches(assign, batch_format="pyarrow")


# --- cardinality aggregation (COUNT DISTINCT, exact + sketch) ---------------


def _flat_tokens(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(flat token array, per-doc token counts) for one batch — the ONE
    tokenize-and-flatten used by every cardinality/heavy-hitter stage,
    so the sketch pass and the exact-verify pass can never count a
    different token stream (that would silently void the deficit
    proof)."""
    import itertools

    tok_lists = [t.split(" ") for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    flat = np.fromiter(
        itertools.chain.from_iterable(tok_lists), object, int(counts.sum())
    )
    return flat, counts


def _lang_term_pairs(batch: pa.Table) -> pa.Table:
    """Distinct (lang, term) pairs of ONE batch — the dedup-before-shuffle
    combiner: only distinct pairs enter the exchange, exactly like the
    index build's per-batch tf combine (stages/postings.py)."""
    flat, counts = _flat_tokens(batch["text"].to_pylist())
    lang_codes, lang_uniq = pd.factorize(
        np.asarray(batch["lang"].to_pylist(), dtype=object), sort=False
    )
    tok_lang = np.repeat(lang_codes, counts)
    term_codes, term_uniq = pd.factorize(flat, sort=False)
    key = tok_lang.astype(np.int64) * len(term_uniq) + term_codes
    uk = np.unique(key)
    # hash-partition key over the PAIR: global (lang, term) dedupe only
    # needs every copy of a pair co-located (the kgram exchange shape) —
    # the consumers hash-exchange on ``part`` instead of string-sorting
    # the vocabulary-sized pair table
    h_term = pd.util.hash_array(term_uniq)
    h_lang = pd.util.hash_array(np.asarray(lang_uniq, dtype=object))
    part = (
        (h_term[uk % len(term_uniq)] ^ h_lang[uk // len(term_uniq)])
        & np.uint64(255)
    ).astype(np.int32)
    return pa.table(
        {
            "lang": pa.array(lang_uniq[uk // len(term_uniq)], pa.string()),
            "term": pa.array(term_uniq[uk % len(term_uniq)], pa.string()),
            "part": pa.array(part, pa.int32()),
        }
    )


def distinct_terms(sf_dir: str) -> pd.DataFrame:
    """lang, n_terms — EXACT per-language distinct-token counts (the
    cardinality aggregation; ES ``cardinality`` at exact precision / SQL
    COUNT(DISTINCT)).  Exchange economy: each batch ships only its
    DISTINCT (lang, term) pairs into a 256-way hash exchange on the
    pair's content hash (global pair-dedupe needs co-location, not the
    string sort a (lang, term) groupby would pay), each partition
    counts its distinct pairs per lang, and a lang-sized groupby sums —
    the driver never sees a vocabulary-sized table.  The sketch
    counterpart for vocabularies too large to shuffle is
    ``cardinality_hll``."""
    from ray.data.aggregate import Sum

    pairs = _read_docs(sf_dir, ["text", "lang"]).map_batches(
        _lang_term_pairs, batch_format="pyarrow"
    )

    def count_in_part(g: pd.DataFrame) -> pa.Table:
        s = g.drop_duplicates(["lang", "term"])["lang"].value_counts()
        return pa.table(
            {
                "lang": pa.array(list(s.index), pa.string()),
                "n_terms": pa.array(s.to_numpy(np.int64), pa.int64()),
            }
        )

    out = (
        pairs.groupby("part")
        .map_groups(count_in_part, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_terms", alias_name="n_terms"))
        .to_pandas()
    )
    out["n_terms"] = out["n_terms"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


def cardinality_hll(sf_dir: str, p: int | None = None) -> pd.DataFrame:
    """lang, n_terms_est — per-language distinct-token ESTIMATES from a
    HyperLogLog sketch (functions/hll.py; Flajolet et al. 2007).  The
    100-TB cardinality path: every batch folds its distinct terms into
    fixed 2^p-byte per-lang registers, per-block partials return
    O(blocks × langs × 2^p) bytes to an element-wise max fold — no
    vocabulary-sized exchange anywhere, and the max-merge makes the
    estimate independent of batch boundaries / parallelism / retries.
    Deterministic (blake2b term hashes), so the estimate is a pure
    function of the distinct-term set; rel. std error 1.04/sqrt(2^p)
    (~1.6 % at the default p=12)."""
    from torchtrajectory_ray.functions.hll import (
        DEFAULT_P,
        hll_add_hashes,
        hll_estimate,
        hll_init,
        hll_merge,
    )
    from torchtrajectory_ray.functions.text import term_hash

    p = DEFAULT_P if p is None else int(p)

    def partial(batch: pa.Table) -> pd.DataFrame:
        pairs = _lang_term_pairs(batch)
        langs = np.asarray(pairs["lang"].to_pylist(), dtype=object)
        terms = pairs["term"].to_pylist()
        hashes = np.fromiter(
            (term_hash(t) for t in terms), np.uint64, len(terms)
        )
        rows = []
        for lang in np.unique(langs):
            regs = hll_init(p)
            hll_add_hashes(regs, hashes[langs == lang])
            rows.append({"lang": str(lang), "regs": regs.tobytes()})
        return pd.DataFrame(rows)

    parts = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    merged: dict[str, np.ndarray] = {}
    for lang, blob in zip(parts["lang"], parts["regs"]):
        regs = np.frombuffer(blob, dtype=np.uint8)
        merged[lang] = (
            hll_merge(merged[lang], regs) if lang in merged else regs
        )
    out = pd.DataFrame(
        {
            "lang": sorted(merged),
            "n_terms_est": [
                round(hll_estimate(merged[g]), 6) for g in sorted(merged)
            ],
        }
    )
    return out


def cardinality_hll_check(sf_dir: str, p: int | None = None) -> pd.DataFrame:
    """lang, n_terms, within_3sigma — the DRIVER-CHECKABLE cardinality
    gate.  ``n_terms`` is the exact per-language distinct-token count
    (COUNT(DISTINCT) — SQL-reproducible) and ``within_3sigma`` asserts
    the HyperLogLog estimate lands inside the published 3σ error bound
    (σ = 1.04/√m, Flajolet et al. 2007 §4): the SQL oracle emits the
    constant 1, so a broken sketch (wrong rho, bad merge, biased
    estimator) flips the Ray side to 0 and the value hash mismatches.
    This closes the one ``no_oracle`` window row from round 4 — the
    sketch itself is deterministic (blake2b hashes, fixed p), so the
    flag is a pure function of the corpus."""
    from torchtrajectory_ray.functions.hll import DEFAULT_P

    p = DEFAULT_P if p is None else int(p)
    exact = distinct_terms(sf_dir)
    est = cardinality_hll(sf_dir, p=p)
    bound = 3.0 * 1.04 / float(np.sqrt(1 << p))
    merged = exact.merge(est, on="lang", how="outer", sort=True)
    # a lang present on one side only is an outright failure, not noise
    ratio_err = np.abs(
        merged["n_terms_est"].to_numpy(dtype=np.float64)
        / merged["n_terms"].to_numpy(dtype=np.float64)
        - 1.0
    )
    within = np.where(np.isfinite(ratio_err) & (ratio_err <= bound), 1, 0)
    return pd.DataFrame(
        {
            "lang": merged["lang"],
            "n_terms": merged["n_terms"].fillna(-1).astype(np.int64),
            "within_3sigma": within.astype(np.int64),
        }
    ).reset_index(drop=True)


def heavy_terms(sf_dir: str, k: int = 20, m: int = 4096) -> pd.DataFrame:
    """rank, term, n — EXACT corpus-wide top-``k`` terms by occurrence
    count, computed WITHOUT a vocabulary-sized shuffle (the heavy-hitter
    path for corpora whose vocabulary no longer fits an exchange):

    1. each block reduces to a Misra-Gries summary of at most ``m``
       (term, count) rows (functions/heavyhitters.py) — the exchange is
       O(blocks × m) regardless of vocabulary;
    2. the driver folds the summaries, accumulating the universal
       ``deficit`` bound (any dropped term's true count <= deficit);
    3. ONE exact counting pass restricted to the O(m) candidate set
       (broadcast sorted array, searchsorted membership per batch)
       recovers exact counts — sketch-then-verify, the same
       candidate-then-verify discipline as WAND and the trigram scans.

    Exactness is CHECKED, not hoped: if the k-th candidate's exact count
    does not strictly dominate the deficit, no proof exists that a
    dropped term couldn't rank — fail loud with the m to retry with."""
    import ray as _ray

    from torchtrajectory_ray.functions.heavyhitters import mg_fold, mg_summary

    def summarize(batch: pa.Table) -> pd.DataFrame:
        flat, _ = _flat_tokens(batch["text"].to_pylist())
        terms, counts = np.unique(flat, return_counts=True)
        s, d = mg_summary(terms, counts, m)
        return pd.DataFrame(
            [{
                "terms": list(s.keys()),
                "counts": [int(v) for v in s.values()],
                "d": int(d),
            }]
        )

    parts = (
        _read_docs(sf_dir, ["text"])
        .map_batches(summarize, batch_format="pyarrow")
        .to_pandas()
    )
    summaries = [
        dict(zip(ts, cs)) for ts, cs in zip(parts["terms"], parts["counts"])
    ]
    acc, deficit = mg_fold(summaries, m)
    deficit += int(parts["d"].sum())
    if not acc:
        # near-uniform counts at a too-small m can cancel EVERY counter:
        # nothing is provable, and there is nothing to verify
        raise ValueError(
            "heavy_terms: the summary fold cancelled every counter "
            f"(deficit {deficit}); retry with m > {m}"
        )
    cand = np.sort(np.asarray(list(acc), dtype=object))
    ref = _ray.put(cand)

    def count_cand(batch: pa.Table) -> pd.DataFrame:
        c = _ray.get(ref)
        flat, _ = _flat_tokens(batch["text"].to_pylist())
        terms, counts = np.unique(flat, return_counts=True)
        idx = np.searchsorted(c, terms)
        idx[idx >= len(c)] = 0
        mask = c[idx] == terms
        return pd.DataFrame(
            {"term": terms[mask], "n": counts[mask].astype(np.int64)}
        )

    exact = (
        _read_docs(sf_dir, ["text"])
        .map_batches(count_cand, batch_format="pyarrow")
        .to_pandas()
        .groupby("term")["n"]
        .sum()
        .reset_index()
        .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
    top = exact.head(k)
    if deficit > 0 and (
        len(exact) < k or int(top["n"].iloc[-1]) <= deficit
    ):
        raise ValueError(
            f"heavy_terms: cannot prove exactness of the top-{k} "
            f"(k-th candidate count {int(top['n'].iloc[-1]) if len(top) else 0}"
            f" <= deficit {deficit}); retry with m > {m}"
        )
    out = top.copy()
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


def heavy_terms_per_lang(
    sf_dir: str, k: int = 10, m: int = 4096
) -> pd.DataFrame:
    """lang, rank, term, n — EXACT top-``k`` terms per language, the
    grouped form of :func:`heavy_terms` (top terms per language/source
    is the per-group vocabulary profile a mixture-weighting pipeline
    reads).  Same sketch-then-verify machinery per group: per-batch
    per-lang Misra-Gries summaries (≤ m rows per (block, lang)), per-lang
    folds with per-lang deficits, ONE exact counting pass over the union
    of the per-lang candidate sets, per-lang exactness proofs (fail loud
    naming the first unprovable group)."""
    import ray as _ray

    from torchtrajectory_ray.functions.heavyhitters import mg_fold, mg_summary

    def summarize(batch: pa.Table) -> pd.DataFrame:
        flat, counts = _flat_tokens(batch["text"].to_pylist())
        langs = np.repeat(
            np.asarray(batch["lang"].to_pylist(), dtype=object), counts
        )
        rows = []
        for lang in np.unique(langs):
            terms, n = np.unique(flat[langs == lang], return_counts=True)
            s, d = mg_summary(terms, n, m)
            rows.append(
                {
                    "lang": str(lang),
                    "terms": list(s.keys()),
                    "counts": [int(v) for v in s.values()],
                    "d": int(d),
                }
            )
        return pd.DataFrame(rows)

    parts = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(summarize, batch_format="pyarrow")
        .to_pandas()
    )
    folds: dict[str, tuple[dict, int]] = {}
    for lang, grp in parts.groupby("lang"):
        summaries = [
            dict(zip(ts, cs)) for ts, cs in zip(grp["terms"], grp["counts"])
        ]
        acc, deficit = mg_fold(summaries, m)
        deficit += int(grp["d"].sum())
        if not acc:
            raise ValueError(
                f"heavy_terms_per_lang[{lang}]: the summary fold cancelled "
                f"every counter (deficit {deficit}); retry with m > {m}"
            )
        folds[lang] = (acc, deficit)
    # one exact pass over the union of candidate sets, keyed (lang, term)
    cand_by_lang = {
        lang: np.sort(np.asarray(list(acc), dtype=object))
        for lang, (acc, _) in folds.items()
    }
    ref = _ray.put(cand_by_lang)

    def count_cand(batch: pa.Table) -> pd.DataFrame:
        cands = _ray.get(ref)
        flat, counts = _flat_tokens(batch["text"].to_pylist())
        lang_arr = np.repeat(
            np.asarray(batch["lang"].to_pylist(), dtype=object), counts
        )
        out_lang, out_term, out_n = [], [], []
        for lang in np.unique(lang_arr):
            c = cands.get(str(lang))
            if c is None or not len(c):
                continue
            terms, n = np.unique(flat[lang_arr == lang], return_counts=True)
            idx = np.searchsorted(c, terms)
            idx[idx >= len(c)] = 0
            mask = c[idx] == terms
            out_lang.extend([str(lang)] * int(mask.sum()))
            out_term.extend(terms[mask])
            out_n.extend(n[mask].astype(np.int64))
        return pd.DataFrame({"lang": out_lang, "term": out_term, "n": out_n})

    exact = (
        _read_docs(sf_dir, ["text", "lang"])
        .map_batches(count_cand, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "term"])["n"]
        .sum()
        .reset_index()
    )
    frames = []
    for lang, (_, deficit) in sorted(folds.items()):
        grp = (
            exact[exact["lang"] == lang]
            .sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
            .reset_index(drop=True)
        )
        top = grp.head(k)
        if deficit > 0 and (
            len(grp) < k or int(top["n"].iloc[-1]) <= deficit
        ):
            raise ValueError(
                f"heavy_terms_per_lang[{lang}]: cannot prove exactness of "
                f"the top-{k} (k-th count "
                f"{int(top['n'].iloc[-1]) if len(top) else 0} <= deficit "
                f"{deficit}); retry with m > {m}"
            )
        top = top.copy()
        top.insert(1, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
        frames.append(top)
    out = pd.concat(frames, ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return out[["lang", "rank", "term", "n"]]


def lang_source_mode(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE: the most frequent ``source`` per language (ties
    broken by source name ascending) plus its count — the categorical
    argmax companion to the numeric group-wise argmax
    (``events.latest_event_per_user``).  Per-batch (lang, source)
    count partials bound the shuffle at |langs|·|sources| rows per
    batch regardless of corpus size; the winner is picked on the
    driver over that tiny aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["lang", "source"]).to_pandas()
        g = df.groupby(["lang", "source"], as_index=False).size()
        g.rename(columns={"size": "n"}, inplace=True)
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "source"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .sum("n")
        .to_pandas()
    )
    counts.rename(columns={"sum(n)": "n"}, inplace=True)
    if "n" not in counts.columns:  # fail loud on aggregate schema drift
        raise RuntimeError(f"unexpected aggregate schema: {list(counts.columns)}")
    # deterministic winner: count DESC, source ASC
    counts = counts.sort_values(
        ["lang", "n", "source"], ascending=[True, False, True], kind="mergesort"
    )
    win = counts.groupby("lang", as_index=False).first()
    return pd.DataFrame(
        {
            "lang": win["lang"],
            "source": win["source"],
            "n": win["n"].astype(np.int64),
        }
    ).sort_values("lang").reset_index(drop=True)
