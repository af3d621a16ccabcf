"""Percolator (registered queries over a document stream): anchor
pruning is answer-invariant, df-ranked anchors pick the rarest term,
non-boolean clauses fail loud.  The match table itself is driver-gated
(queries()[percolate])."""

from __future__ import annotations

import pytest

from torchtrajectory_ray.pipelines import percolate
from torchtrajectory_ray.pipelines.corpus import PERC_QUERIES

SF = "/root/testdata/sf0.001"


def test_matches_are_anchor_invariant(ray_session):
    """The anchor only prunes: anchoring every query at a DIFFERENT
    required term must produce the identical match table."""
    base = percolate.percolate(SF, PERC_QUERIES)
    # df table that inverts the tie-break order → different anchors
    reg_a = percolate.compile_registry(PERC_QUERIES)
    fake_df = {r["anchor"]: 10**9 for r in reg_a}
    reg_b = percolate.compile_registry(PERC_QUERIES, df=fake_df)
    changed = sum(
        1
        for a, b in zip(reg_a, reg_b)
        if a["anchor"] != b["anchor"] and len(a["must"]) + len(a["phrases"]) > 1
    )
    assert changed > 0  # the experiment is real
    alt = (
        percolate.percolate_ds(SF, PERC_QUERIES, df=fake_df)
        .to_pandas()[["query_id", "doc_id"]]
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert alt.values.tolist() == base.values.tolist()
    assert len(base) > 0


def test_rarest_anchor_selected(ray_session):
    df = {"spark": 100, "join": 3}
    reg = percolate.compile_registry(
        [{"query_id": 0, "q": "+spark +join"}], df=df
    )
    assert reg[0]["anchor"] == "join"


def test_never_matching_exclusion_is_inert(ray_session):
    both = percolate.percolate(
        SF,
        [
            {"query_id": 0, "q": "+spark"},
            {"query_id": 1, "q": "+spark -nosuchtermxyz"},
        ],
    )
    g = both.groupby("query_id")["doc_id"].apply(list)
    assert g[0] == g[1]


def test_non_boolean_clauses_fail_loud():
    for bad in ("spark", "spark~", "sp*", "+spark^2.0", '"a b"~2'):
        with pytest.raises(ValueError):
            percolate.compile_registry([{"query_id": 0, "q": bad}])
    with pytest.raises(ValueError, match="positive clause|required term"):
        percolate.compile_registry([{"query_id": 0, "q": "-only -nots"}])


def test_empty_and_unknown_edges(ray_session):
    """Unknown query terms → empty significant-terms table with the
    stable schema; a registry whose anchors never occur matches
    nothing (and cheaply — no candidate ever fully evaluates)."""
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    df = eng.significant_terms(["nosuchtermxyz"], n=5)
    assert list(df.columns) == ["term", "fg_df", "df", "lift"]
    assert len(df) == 0
    m = percolate.percolate(
        SF, [{"query_id": 0, "q": "+nosuchtermxyz +alsonothere"}]
    )
    assert len(m) == 0 and list(m.columns) == ["query_id", "doc_id"]


def test_vectorized_equals_anchored_route(ray_session):
    """The docs×terms membership-matrix route and the per-doc anchor
    route must produce the identical match table."""
    from torchtrajectory_ray.pipelines.percolate import _PercolateTask

    reg = percolate.compile_registry(PERC_QUERIES)
    import pyarrow.parquet as pq

    batch = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    task = _PercolateTask(reg, "default")
    assert task.vec
    a = task(batch).to_pandas().sort_values(["query_id", "doc_id"])
    task.vec = False  # force the anchor route on the same batch
    b = task(batch).to_pandas().sort_values(["query_id", "doc_id"])
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0
