"""Engine configuration dataclasses.

Analogs of the reference's builder surfaces:
``MapMatching.Builder`` (/root/reference/src/main/java/au/edu/rmit/bdm/Torch/
mapMatching/MapMatching.java:151-220) -> ``IndexConfig``; ``Engine.Builder``
(Torch/queryEngine/Engine.java:176-293) -> ``BM25Params`` + engine options.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """BM25 scoring parameters (replaces the reference's pluggable
    SimilarityFunction, Torch/queryEngine/similarity/SimilarityFunction.java:44-47).

    idf is Lucene-style: ln(1 + (N - df + 0.5) / (df + 0.5)).
    """

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    """Index-build configuration.

    - ``num_segments``: number of term-sharded output segments
      (segment = hash(term_id) % num_segments).
    - ``salt_df_threshold``: a term whose estimated document frequency
      exceeds this is "head" and its postings shuffle under
      (term_id, salt) instead of term_id alone — the explicit skew
      handling the reference lacks (its HashMap hides giant posting
      lists for popular edges, SURVEY.md §4).
    - ``num_salts``: salt bucket count for head terms.  Salt is taken
      from the doc_id's high bits so salted partials cover disjoint,
      ordered doc_id ranges and merge by concatenation.
    - ``block_size``: posting block length for block-max metadata
      (block-max WAND skipping).
    """

    num_segments: int = 8
    salt_df_threshold: int = 50_000
    num_salts: int = 16
    block_size: int = 128
    bm25: BM25Params = field(default_factory=BM25Params)
    tokenize_batch_size: int = 1024
    store_positions: bool = False
