"""Pure-Python single-process oracle: dict-of-lists inverted index +
exhaustive BM25 / boolean retrieval.

The Ray pipeline must be rank-identical in top-k doc ids and score-equal
within 1e-9 against this oracle (SURVEY.md §5).  Structurally this is the
reference's in-heap index (HashMap<edge, Map<trajId, pos>>,
/root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/invertedIndex/
InvertedIndex.java:23) plus exhaustive scoring with no pruning — the
ground truth the pruned (WAND/LORS) path is checked against.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from torchtrajectory_ray.functions.bm25 import idf
from torchtrajectory_ray.functions.text import tokenize


@dataclass
class OracleIndex:
    n_docs: int = 0
    total_len: int = 0
    doclen: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.total_len / self.n_docs if self.n_docs else 0.0

    def add(self, doc_id: int, text: str) -> None:
        toks = tokenize(text)
        self.n_docs += 1
        self.total_len += len(toks)
        self.doclen[doc_id] = len(toks)
        for t in toks:
            self.postings.setdefault(t, {})
            self.postings[t][doc_id] = self.postings[t].get(doc_id, 0) + 1

    # --- boolean algebra (EdgeInvertedIndex.findByPath:52-62 /
    #     findByStrictPath:65-89) ---
    def bool_or(self, terms: list[str]) -> list[int]:
        s: set[int] = set()
        for t in terms:
            s |= set(self.postings.get(t, {}))
        return sorted(s)

    def bool_and(self, terms: list[str]) -> list[int]:
        counts: dict[int, int] = {}
        uniq = sorted(set(terms))
        for t in uniq:
            for d in self.postings.get(t, {}):
                counts[d] = counts.get(d, 0) + 1
        return sorted(d for d, c in counts.items() if c == len(uniq))

    # --- exhaustive BM25 top-k ---
    def topk(
        self, terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
    ) -> list[tuple[int, float]]:
        """Top-k by (score desc, doc_id asc); duplicate query terms are
        scored once per unique term (like counting distinct query edges,
        EdgeInvertedIndex.java:65-89)."""
        scores: dict[int, float] = {}
        for t in sorted(set(terms)):
            plist = self.postings.get(t)
            if not plist:
                continue
            w = float(idf(len(plist), self.n_docs))
            for d, tf in plist.items():
                dl = self.doclen[d]
                tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
                scores[d] = scores.get(d, 0.0) + w * tfn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def build_oracle(doc_ids: list[int], texts: list[str]) -> OracleIndex:
    idx = OracleIndex()
    for d, t in zip(doc_ids, texts):
        idx.add(int(d), t)
    return idx
