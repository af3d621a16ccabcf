"""Percolator — registered queries matched against a document STREAM
(the Lucene/Elasticsearch percolate shape, inverted from normal search:
the queries are the index, the documents are the probes).

The routing/tagging stage of a training-data pipeline: register the
taxonomy once ("docs about X", "docs mentioning A next to B", "docs
NOT containing C"), stream the corpus through once, emit (doc_id,
query_id) matches.

Scale shape — the classic percolator trick, not per-doc × per-query
evaluation:

1. the registry is inverted ONCE on the driver: every query is anchored
   by a single required term (its rarest ``+must`` / phrase token,
   ranked by corpus df when available), giving anchor_term → [queries];
2. each ``map_batches`` task tokenizes its docs once and probes the
   anchor table — a doc only FULLY evaluates the queries whose anchor
   it contains (at 10^6 registered queries a doc touches the few whose
   anchor terms it holds, never the registry);
3. full evaluation is vectorized per batch: token-set containment for
   ``must`` / ``must_not``, the sliding-window equality kernel for
   phrases.

Registered queries use the search-box grammar restricted to its
boolean core: ``+must`` terms, ``-not`` terms, quoted phrases (scoring
clauses have no meaning here — percolation is a match, not a ranking;
bare/fuzzy/wildcard/boost clauses are rejected loudly)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from torchtrajectory_ray.functions.querylang import parse_query
from torchtrajectory_ray.functions.text import get_tokenizer


def compile_registry(
    queries: list[dict], tokenizer: str = "default", df: dict | None = None
) -> list[dict]:
    """Parse + anchor the registered queries.  ``df`` (term → corpus
    document frequency) picks the RAREST anchor; without it the first
    required term anchors (correctness is anchor-independent — the
    anchor only prunes).  Each entry: {query_id, must, must_not,
    phrases, anchor}."""
    tok = get_tokenizer(tokenizer)
    out = []
    for q in queries:
        p = parse_query(q["q"], tok)
        if p.should or p.fuzzy or p.wildcards or p.boosts or p.prox:
            raise ValueError(
                f"percolator queries are boolean: +must / -not / \"phrase\" "
                f"only (query {q['query_id']}: {q['q']!r})"
            )
        required = list(
            dict.fromkeys(p.must + [t for ph in p.phrases for t in ph])
        )
        if not required:
            raise ValueError(
                f"percolator query {q['query_id']} has no required term"
            )
        anchor = (
            min(required, key=lambda t: (df.get(t, 0), t))
            if df
            else required[0]
        )
        out.append(
            {
                "query_id": int(q["query_id"]),
                "must": p.must,
                "must_not": p.must_not,
                "phrases": p.phrases,
                "anchor": anchor,
            }
        )
    return out


def _phrase_in(toks: list[str], phrase: list[str]) -> bool:
    n = len(phrase)
    if len(toks) < n:
        return False
    arr = np.asarray(toks, dtype=object)
    m = np.ones(len(toks) - n + 1, dtype=bool)
    for j, term in enumerate(phrase):
        m &= arr[j : len(toks) - n + 1 + j] == term
        if not m.any():
            return False
    return True


class _PercolateTask:
    """map_batches task: docs batch → (doc_id, query_id) matches.  The
    compiled registry rides the task closure (broadcast once per worker
    by Ray's task serialization — at a 10^6-query registry, ship it via
    ``ray.put`` and pass the ObjectRef instead).

    Two evaluation routes, identical answers (tested):
    - registries referencing ≤ ``_VEC_MAX_TERMS`` distinct terms build
      ONE docs×terms boolean membership matrix per batch (flatten +
      factorize, no per-doc Python beyond tokenization) and evaluate
      every query as column algebra; phrases verify only on the docs
      whose boolean mask survived;
    - larger registries fall back to the per-doc anchor route (a doc
      touches only the queries whose anchor it contains)."""

    _VEC_MAX_TERMS = 4096

    def __init__(self, registry: list[dict], tokenizer: str, id_column: str = "doc_id"):
        self.registry = registry
        self.id_column = id_column
        self.tokenize = get_tokenizer(tokenizer)
        self.by_anchor: dict[str, list[dict]] = {}
        for r in registry:
            self.by_anchor.setdefault(r["anchor"], []).append(r)
        ref_terms = sorted(
            {t for r in registry for t in r["must"] + r["must_not"]}
            | {t for r in registry for ph in r["phrases"] for t in ph}
        )
        self.vec = len(ref_terms) <= self._VEC_MAX_TERMS
        self.ref_col = {t: i for i, t in enumerate(ref_terms)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_pylist()
        tok_lists = [self.tokenize(t) for t in batch["text"].to_pylist()]
        if self.vec:
            out_d, out_q = self._eval_vectorized(ids, tok_lists)
        else:
            out_d, out_q = self._eval_anchored(ids, tok_lists)
        return pa.table(
            {
                self.id_column: pa.array(out_d, batch[self.id_column].type),
                "query_id": pa.array(out_q, pa.int64()),
            }
        )

    def _eval_vectorized(self, ids, tok_lists):
        import itertools

        import pandas as pd

        n = len(ids)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n)
        total = int(counts.sum())
        mask = np.zeros((n, len(self.ref_col)), dtype=bool)
        if total:
            flat = np.fromiter(
                itertools.chain.from_iterable(tok_lists), object, total
            )
            codes, uniq = pd.factorize(flat, sort=False)
            col = np.fromiter(
                (self.ref_col.get(u, -1) for u in uniq), np.int64, len(uniq)
            )
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            tok_col = col[codes]
            hit = tok_col >= 0
            mask[doc_idx[hit], tok_col[hit]] = True
        out_d, out_q = [], []
        for r in self.registry:
            m = np.ones(n, dtype=bool)
            for t in r["must"]:
                m &= mask[:, self.ref_col[t]]
            for t in r["must_not"]:
                m &= ~mask[:, self.ref_col[t]]
            if r["phrases"]:
                for i in np.flatnonzero(m):
                    if all(
                        _phrase_in(tok_lists[i], ph) for ph in r["phrases"]
                    ):
                        out_d.append(ids[i])
                        out_q.append(r["query_id"])
            else:
                out_d.extend(ids[i] for i in np.flatnonzero(m))
                out_q.extend([r["query_id"]] * int(m.sum()))
        return out_d, out_q

    def _eval_anchored(self, ids, tok_lists):
        out_d, out_q = [], []
        for d, toks in zip(ids, tok_lists):
            tset = set(toks)
            cands = []
            for t in tset & self.by_anchor.keys():
                cands.extend(self.by_anchor[t])
            for r in cands:
                if any(t not in tset for t in r["must"]):
                    continue
                if any(t in tset for t in r["must_not"]):
                    continue
                if any(not _phrase_in(toks, ph) for ph in r["phrases"]):
                    continue
                out_d.append(d)
                out_q.append(r["query_id"])
        return out_d, out_q


def percolate_ds(
    sf_dir_or_paths,
    queries: list[dict],
    tokenizer: str = "default",
    df: dict | None = None,
    id_column: str = "doc_id",
) -> ray.data.Dataset:
    """Stream the corpus through the registered queries → Dataset of
    (id, query_id) matches.  One read pass, no shuffle — every task
    evaluates its own docs against the broadcast registry.
    ``id_column`` names the document identifier (``doc_id`` for the
    canonical tables; ``url`` for raw ingested page shards)."""
    registry = compile_registry(queries, tokenizer, df)
    if isinstance(sf_dir_or_paths, str):
        src = f"{sf_dir_or_paths}/documents.parquet"
    else:
        src = list(sf_dir_or_paths)
    return ray.data.read_parquet(src, columns=[id_column, "text"]).map_batches(
        _PercolateTask(registry, tokenizer, id_column), batch_format="pyarrow"
    )


def percolate(sf_dir: str, queries: list[dict]) -> pd.DataFrame:
    """Driver-gate projection: the full (query_id, doc_id) match table,
    sorted."""
    df = percolate_ds(sf_dir, queries).to_pandas()
    if df.empty:  # zero matches: keep the stable two-column schema
        return pd.DataFrame({"query_id": [], "doc_id": []}).astype(
            {"query_id": "int64", "doc_id": "int64"}
        )
    return (
        df[["query_id", "doc_id"]]
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
