"""Corpus-statistics language-model passes: unigram-LM quality scoring
(the CCNet "LM filter" analog) and per-document TF-IDF keyword
extraction (the labeling pass that tags each doc with its most
distinctive terms).

Both share one shape — a corpus-wide statistics aggregate whose result
is broadcast once (``ray.put``) and consumed by a streaming per-batch
scorer — the same two-pass discipline as ``lines.line_dedup_ds``:

1. **stats pass** — per-batch pre-aggregated token (or per-doc distinct
   token) counts, ONE ``groupby(token)`` shuffle that moves at most one
   row per distinct token per block, result collected to the driver.
   At web scale the vocabulary is the knob: ``min_count`` /``min_df``
   folds the long tail into an OOV bucket so the broadcast stays
   bounded (Zipf: the tail is huge in types, tiny in tokens).  The sf
   gates run at ``min_count=1`` (no OOV) so DuckDB reproduces the
   result exactly.
2. **score pass** — the sorted vocabulary + statistics array ships via
   ``ray.put``; each batch resolves its tokens with ONE vectorized
   ``np.searchsorted`` and reduces per doc with ``add.reduceat`` /
   a single pandas sort — no shuffle, output streams.

Reference analog: the corpus-statistics pass of the index build
(SURVEY.md A7/A8 — global stats + frequency histograms,
``/root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/invertedIndex/InvertedIndex.java``
term-frequency accounting) re-targeted at model-quality signals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _token_count_partial(batch: pa.Table) -> pa.Table:
    """(token, n) occurrence counts of one batch, pre-aggregated."""
    flat: list[str] = []
    for t in batch["text"].to_pylist():
        flat.extend(t.split(" "))
    if not flat:
        return pa.table(
            {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    return pa.table(
        {
            "tok": pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64), pa.int64()),
        }
    )


def _with_tok_part(tbl: pa.Table) -> pa.Table:
    """Append the 256-way hash-partition key over ``tok``: the global
    sum per token only needs its rows CO-LOCATED (the kgram exchange
    shape) — a hash exchange replaces the string sort a
    ``groupby("tok")`` would pay over the vocabulary-sized partials."""
    toks = np.asarray(tbl["tok"].to_pylist(), dtype=object)
    part = (pd.util.hash_array(toks) & np.uint64(255)).astype(np.int32)
    return tbl.append_column("part", pa.array(part, pa.int32()))


def _sum_tok_part(g: pd.DataFrame) -> pa.Table:
    """One hash partition of (tok, n) partials → exact per-token sums."""
    s = g.groupby("tok", sort=False)["n"].sum()
    return pa.table(
        {
            "tok": pa.array(list(s.index), pa.string()),
            "n": pa.array(s.to_numpy(np.int64), pa.int64()),
        }
    )


def unigram_counts(
    docs: ray.data.Dataset, min_count: int = 1
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Corpus unigram table of a ``(doc_id, text)`` dataset: sorted
    token array, aligned counts, total token count, and the folded OOV
    mass (total occurrences of tokens below ``min_count`` — 0 when
    ``min_count=1``)."""
    freqs = (
        docs.map_batches(_token_count_partial, batch_format="pyarrow")
        .map_batches(_with_tok_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum_tok_part, batch_format="pandas")
        .to_pandas()
    )
    if freqs.empty:
        return np.asarray([], dtype=object), np.zeros(0, np.int64), 0, 0
    total = int(freqs["n"].sum())
    kept = freqs[freqs["n"] >= min_count]
    oov_mass = total - int(kept["n"].sum())
    order = np.argsort(kept["tok"].to_numpy())
    return (
        kept["tok"].to_numpy()[order],
        kept["n"].to_numpy().astype(np.int64)[order],
        total,
        oov_mass,
    )


def lm_quality_ds(
    docs_factory, min_count: int = 1
) -> ray.data.Dataset:
    """Unigram-LM quality score over any ``(doc_id, text)`` dataset:
    ``doc_id, n_tokens, nll`` where ``nll`` is the mean negative log
    probability of the doc's tokens under the corpus unigram model
    (lower = more typical text; the CCNet filter keeps the middle of
    the distribution).  Tokens rarer than ``min_count`` score as one
    shared OOV bucket holding the folded tail mass (with ``min_count=1``
    every token is in-vocab and the score is exact).

    ``docs_factory`` is a zero-arg callable returning the dataset (two
    streaming reads: stats pass + score pass)."""
    toks, counts, total, oov_mass = unigram_counts(docs_factory(), min_count)
    # log-prob per vocab entry; OOV floor uses the folded tail mass
    # (or the rarest kept count as a proxy for an empty tail)
    with np.errstate(divide="ignore"):
        logp = np.log(counts / total) if total else np.zeros(0)
        oov_logp = float(
            np.log((oov_mass or (counts.min() if counts.size else 1)) / total)
            if total
            else 0.0
        )
    ref = ray.put((toks, logp))

    def score(batch: pa.Table) -> pa.Table:
        vocab, lp = ray.get(ref)
        texts = batch["text"].to_pylist()
        tok_lists = [t.split(" ") for t in texts]
        n = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
        flat = np.asarray(
            [tok for ts in tok_lists for tok in ts], dtype=object
        )
        if vocab.size and flat.size:
            pos = np.searchsorted(vocab, flat)
            pos_c = np.minimum(pos, len(vocab) - 1)
            hit = vocab[pos_c] == flat
            tok_lp = np.where(hit, lp[pos_c], oov_logp)
        else:
            tok_lp = np.full(len(flat), oov_logp)
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        sums = np.add.reduceat(tok_lp, starts) if flat.size else np.zeros(0)
        # reduceat quirk: a zero-length segment copies the next element
        sums = np.where(n > 0, sums, 0.0)
        nll = -sums / np.maximum(n, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "nll": pa.array(np.round(nll, 6), pa.float64()),
            }
        )

    return docs_factory().map_batches(score, batch_format="pyarrow")


def lm_quality(sf_dir: str) -> ray.data.Dataset:
    """Gate entry: exact (``min_count=1``) unigram NLL per document."""
    return lm_quality_ds(lambda: _docs(sf_dir))


def _batch_bigrams(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized word-bigram expansion of one batch, factorized:
    returns ``(uniq_bigrams, inv, doc_idx, nb)`` where ``uniq_bigrams``
    holds each DISTINCT bigram string of the batch exactly once,
    ``inv`` maps each bigram occurrence to its distinct index, and
    ``doc_idx``/``nb`` give the owning doc per occurrence and per-doc
    bigram counts.  Bigram occurrences are int pair codes (token
    factorize → left·V + right), so the expensive object-string
    concatenation runs once per DISTINCT pair, not per occurrence —
    the difference between 1.2k and 10k+ docs/s on Zipf text."""
    tok_lists = [t.split(" ") for t in texts]
    n = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    flat = np.asarray([tok for ts in tok_lists for tok in ts], dtype=object)
    nb = np.maximum(n - 1, 0)
    empty = np.asarray([], dtype=object)
    if flat.size < 2 or not nb.sum():
        return empty, np.zeros(0, np.int64), np.zeros(0, np.int64), nb
    # a token starts a bigram unless it is the last token of its doc
    starts_next = np.cumsum(n)[:-1]  # first-token index of docs 1..
    valid = np.ones(len(flat) - 1, bool)
    valid[starts_next - 1] = False
    codes, uniq_toks = pd.factorize(flat, sort=False)
    v = np.int64(len(uniq_toks))
    pair = codes[:-1][valid].astype(np.int64) * v + codes[1:][valid]
    upair, inv = np.unique(pair, return_inverse=True)
    toks_arr = np.asarray(uniq_toks, dtype=object)
    uniq_bg = toks_arr[(upair // v)] + " " + toks_arr[(upair % v)]
    doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), nb)
    return uniq_bg, inv.astype(np.int64), doc_idx, nb


def _dsir_keys(bg: np.ndarray, n_buckets: int | None) -> np.ndarray:
    """Feature keys: exact bigram strings, or the paper's hashed buckets
    via pandas' vectorized deterministic string hash (fixed key, stable
    across processes/runs — no per-bigram Python loop)."""
    if n_buckets is None:
        return bg
    h = pd.util.hash_array(bg, categorize=True)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def dsir_fit_ds(
    docs_factory,
    target_lang: str = "en",
    n_buckets: int | None = None,
) -> dict:
    """Fit the DSIR model over a ``(doc_id, lang, text)`` dataset: ONE
    streaming stats pass (per-batch pre-aggregated ``(feature, n_raw,
    n_target)`` partials, one groupby shuffle) producing the smoothed
    log-likelihood-ratio table.  Returns a picklable model dict
    ``{vocab, llr, n_buckets}`` — train once on (target sample, raw
    pile), then ``dsir_score_ds`` any NEW shard against it (bigrams the
    model never saw contribute 0)."""

    def stats_partial(batch: pa.Table) -> pa.Table:
        uniq_bg, inv, doc_idx, _ = _batch_bigrams(batch["text"].to_pylist())
        key_t = pa.string() if n_buckets is None else pa.int64()
        if not uniq_bg.size:
            return pa.table(
                {
                    "f": pa.array([], key_t),
                    "n_raw": pa.array([], pa.int64()),
                    "n_tgt": pa.array([], pa.int64()),
                }
            )
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        tgt_occ = langs[doc_idx] == target_lang
        # counts per DISTINCT batch bigram (hash collisions within a
        # batch emit duplicate key rows — the Sum groupby merges them)
        n_raw = np.bincount(inv, minlength=len(uniq_bg))
        n_tgt = np.bincount(inv[tgt_occ], minlength=len(uniq_bg))
        return pa.table(
            {
                "f": pa.array(_dsir_keys(uniq_bg, n_buckets), key_t),
                "n_raw": pa.array(n_raw.astype(np.int64), pa.int64()),
                "n_tgt": pa.array(n_tgt.astype(np.int64), pa.int64()),
            }
        )

    freqs = (
        docs_factory()
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("f")
        .aggregate(Sum("n_raw", alias_name="cr"), Sum("n_tgt", alias_name="ct"))
        .to_pandas()
    )
    if freqs.empty:
        vocab, llr = np.asarray([], dtype=object), np.zeros(0)
    else:
        order = np.argsort(freqs["f"].to_numpy())
        vocab = freqs["f"].to_numpy()[order]
        cr = freqs["cr"].to_numpy().astype(np.float64)[order]
        ct = freqs["ct"].to_numpy().astype(np.float64)[order]
        v = float(len(vocab))
        tr, tt = float(cr.sum()), float(ct.sum())
        llr = np.log((ct + 1.0) / (tt + v)) - np.log((cr + 1.0) / (tr + v))
    return {"vocab": vocab, "llr": llr, "n_buckets": n_buckets}


def dsir_score_ds(docs_factory, model: dict) -> ray.data.Dataset:
    """Score a ``(doc_id, text)`` dataset against a fitted DSIR model:
    ``doc_id, n_feats, logw``.  The model table ships once via
    ``ray.put``; each batch probes it once per DISTINCT bigram
    (``searchsorted``) and folds per doc with ``np.add.at``.  Features
    absent from the model contribute 0 (the OOV rule for scoring piles
    the model never saw)."""
    n_buckets = model["n_buckets"]
    ref = ray.put((model["vocab"], model["llr"]))

    def score(batch: pa.Table) -> pa.Table:
        voc, lr = ray.get(ref)
        uniq_bg, inv, doc_idx, nb = _batch_bigrams(batch["text"].to_pylist())
        logw = np.zeros(len(nb))
        if uniq_bg.size and len(voc):
            keys = _dsir_keys(uniq_bg, n_buckets)
            # one model probe per DISTINCT batch bigram
            pos = np.searchsorted(voc, keys)
            pos_c = np.minimum(pos, len(voc) - 1)
            lr_u = np.where(voc[pos_c] == keys, lr[pos_c], 0.0)
            np.add.at(logw, doc_idx, lr_u[inv])
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_feats": pa.array(nb, pa.int64()),
                "logw": pa.array(np.round(logw, 6), pa.float64()),
            }
        )

    return docs_factory().map_batches(score, batch_format="pyarrow")


def dsir_weights_ds(
    docs_factory,
    target_lang: str = "en",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023) over a ``(doc_id, lang, text)``
    dataset: ``doc_id, n_feats, logw`` where ``logw`` is the summed
    log-likelihood ratio of the doc's word bigrams under the TARGET
    feature distribution (docs with ``lang == target_lang``) vs the RAW
    corpus distribution, both add-one smoothed over the raw bigram
    vocabulary — high ``logw`` = looks like the target domain, the
    signal DSIR resamples by.

    Two streaming passes (the module's shared shape): pass 1 emits
    per-batch pre-aggregated ``(feature, n_raw, n_target)`` partials
    through ONE groupby shuffle (at most one row per distinct feature
    per block) and broadcasts the smoothed log-ratio table once; pass 2
    probes the table once per DISTINCT batch bigram (``searchsorted``)
    and folds per doc with ``np.add.at``.

    ``n_buckets`` switches the feature space from exact bigrams to the
    paper's hashed buckets — the 100-TB path, where the broadcast table
    is O(n_buckets) regardless of vocabulary size.  Bucketing uses
    pandas' vectorized deterministic string hash (fixed key, stable
    across processes/runs — no per-bigram Python loop).  The sf gate
    runs exact so DuckDB reproduces it.  Implemented as
    ``dsir_score_ds(docs, dsir_fit_ds(docs, ...))`` — fit and score are
    independently reusable."""
    return dsir_score_ds(
        docs_factory, dsir_fit_ds(docs_factory, target_lang, n_buckets)
    )


def dsir_weights(sf_dir: str, target_lang: str = "en") -> ray.data.Dataset:
    """Gate entry: exact-bigram DSIR log importance weights per doc."""

    def docs():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
        )

    return dsir_weights_ds(docs)


def dsir_select_ds(
    docs_factory,
    frac: float = 0.3,
    target_lang: str = "en",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """DSIR selection: keep the top-``frac`` of the corpus by importance
    weight — ``doc_id, logw`` of every doc whose weight reaches the
    (1−frac) quantile (ties at the threshold all kept, so the result is
    sample-order independent; the deterministic top-quantile variant of
    the paper's Gumbel resampling).

    The threshold is an EXACT quantile without a global sort: weights
    are 6-dp rounded, so micro-unit int64 values feed the same
    value-histogram reduction as ``textstats.length_quantile_thresholds``
    (one row per distinct weight per block through a tiny groupby).  The
    weights dataset is materialized once (3 narrow columns — the cheap
    side of the pipeline) and re-filtered, so document text is never
    read twice."""
    if not 0.0 < frac <= 1.0:
        raise ValueError("frac must be in (0, 1]")
    w = dsir_weights_ds(docs_factory, target_lang, n_buckets).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        u = np.rint(batch["logw"].to_numpy() * 1e6).astype(np.int64)
        v, c = np.unique(u, return_counts=True)
        return pa.table(
            {"u": pa.array(v), "c": pa.array(c.astype(np.int64))}
        )

    hist = (
        w.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("u")
    )
    vals = hist["u"].to_numpy()
    cum = hist["c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return w.select_columns(["doc_id", "logw"])
    # quantile_disc convention: sorted element at ceil(p·n) − 1
    rank = max(int(np.ceil((1.0 - frac) * n)), 1)
    thr = vals[int(np.searchsorted(cum, rank, side="left"))]

    def keep(batch: pa.Table) -> pa.Table:
        u = np.rint(batch["logw"].to_numpy() * 1e6).astype(np.int64)
        return batch.select(["doc_id", "logw"]).filter(
            pa.array(u >= thr)
        )

    return w.map_batches(keep, batch_format="pyarrow")


def dsir_select(sf_dir: str, frac: float = 0.3) -> ray.data.Dataset:
    """Gate entry: top-30%-by-weight DSIR selection (exact bigrams)."""

    def docs():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
        )

    return dsir_select_ds(docs, frac=frac)


def _doc_df_partial(batch: pa.Table) -> pa.Table:
    """(token, n_docs) partial document frequencies of one batch."""
    per_doc = [set(t.split(" ")) for t in batch["text"].to_pylist()]
    flat = [tok for s in per_doc for tok in s]
    if not flat:
        return pa.table(
            {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    return pa.table(
        {
            "tok": pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(codes).astype(np.int64), pa.int64()),
        }
    )


def doc_keywords_ds(
    docs_factory, n_docs: int, k: int = 3, min_df: int = 1
) -> ray.data.Dataset:
    """Top-``k`` TF-IDF keywords per document over any ``(doc_id,
    text)`` dataset: ``doc_id, rank, term, score`` with ``score =
    tf * ln(n_docs / df)`` (raw ln-IDF; a term in every doc scores 0),
    ranked score-descending with ties broken term-ascending.  Terms in
    fewer than ``min_df`` docs are skipped (the scale knob — rare-term
    types dominate the vocabulary; the gate runs ``min_df=1``)."""
    df_tbl = (
        docs_factory()
        .map_batches(_doc_df_partial, batch_format="pyarrow")
        .map_batches(_with_tok_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_sum_tok_part, batch_format="pandas")
        .to_pandas()
        .rename(columns={"n": "df"})
    )
    df_tbl = df_tbl[df_tbl["df"] >= min_df]
    order = np.argsort(df_tbl["tok"].to_numpy())
    vocab = df_tbl["tok"].to_numpy()[order]
    idf = np.log(n_docs / df_tbl["df"].to_numpy().astype(np.float64))[order]
    ref = ray.put((vocab, idf))

    def extract(batch: pa.Table) -> pa.Table:
        voc, idf_ = ray.get(ref)
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        tok_lists = [t.split(" ") for t in batch["text"].to_pylist()]
        n = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
        flat = np.asarray(
            [tok for ts in tok_lists for tok in ts], dtype=object
        )
        d = pd.DataFrame({"doc_id": [], "term": [], "score": []})
        if flat.size and len(voc):
            # one factorize per batch; (doc, term) tf via a composite key
            doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n)
            codes, uniq = pd.factorize(flat, sort=False)
            key = doc_idx * len(uniq) + codes
            ukey, tf = np.unique(key, return_counts=True)
            u_doc = (ukey // len(uniq)).astype(np.int64)
            u_code = (ukey % len(uniq)).astype(np.int64)
            pos = np.searchsorted(voc, uniq)
            pos_c = np.minimum(pos, len(voc) - 1)
            hit_term = voc[pos_c] == uniq  # in-vocab per batch-local term
            keep = hit_term[u_code]
            d = pd.DataFrame(
                {
                    "doc_id": ids[u_doc[keep]],
                    "term": uniq[u_code[keep]],
                    "score": tf[keep] * idf_[pos_c[u_code[keep]]],
                }
            )
        if d.empty:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        d = d.sort_values(
            ["doc_id", "score", "term"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        d["rank"] = d.groupby("doc_id").cumcount() + 1
        d = d[d["rank"] <= k]
        return pa.table(
            {
                "doc_id": pa.array(d["doc_id"].to_numpy(), pa.int64()),
                "rank": pa.array(d["rank"].to_numpy(), pa.int64()),
                "term": pa.array(d["term"].to_numpy(), pa.string()),
                "score": pa.array(np.round(d["score"].to_numpy(), 6)),
            }
        )

    return docs_factory().map_batches(extract, batch_format="pyarrow")


def doc_keywords(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Gate entry: exact (``min_df=1``) top-``k`` keywords per doc."""
    n_docs = _docs(sf_dir).count()
    return doc_keywords_ds(lambda: _docs(sf_dir), n_docs=n_docs, k=k)
