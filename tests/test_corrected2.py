"""Two-tier spell-corrected retrieval (DirectSpellChecker maxEdits
escalation): edit-1 corrections first, the edit-2 dictionary scan only
for terms with no edit-1 candidate.  The sf0.01 oracle gate
(`topk_corrected2`) runs in test_driver_gate.py; these tests pin the
escalation semantics on the sf0.001 index."""

from __future__ import annotations

import pytest

from torchtrajectory_ray.pipelines.corpus import (
    TYPO2_QUERIES,
    _engine,
    documents_index,
    topk_corrected2,
)

SF = "/root/testdata/sf0.001"


def test_edit2_fallback_corrects(ray_session):
    eng = _engine(documents_index(SF))
    # no dictionary term within edit 1 of "spqrx"; "spark" is at 2
    assert eng.fuzzy_terms("spqrx", max_edits=1).empty
    terms, res = eng.topk_corrected(["spqrx", "join"], k=10, max_edits=2)
    assert terms == ["join", "spark"]
    assert res == eng.topk(terms, k=10)
    # under max_edits=1 the same typo is uncorrectable and drops
    t1, r1 = eng.topk_corrected(["spqrx", "join"], k=10, max_edits=1)
    assert t1 == ["join"] and r1 == eng.topk(["join"], k=10)


def test_edit1_tier_outranks_edit2(ray_session):
    eng = _engine(documents_index(SF))
    # "tble" has table at distance 1 AND the at distance 2; "qery" has
    # query at 1 AND key at 2 — the closer candidate must win even
    # when the farther one has higher df (distance outranks df)
    terms, _ = eng.topk_corrected(["tble"], k=5, max_edits=2)
    assert terms == ["table"]
    terms, _ = eng.topk_corrected(["qery"], k=5, max_edits=2)
    assert terms == ["query"]


def test_uncorrectable_and_validation(ray_session):
    eng = _engine(documents_index(SF))
    t, r = eng.topk_corrected(["zzzzzz"], k=10, max_edits=2)
    assert t == [] and r == []
    with pytest.raises(ValueError, match="max_edits"):
        eng.topk_corrected(["spak"], k=5, max_edits=3)


def test_pipeline_shape(ray_session):
    df = topk_corrected2(SF, k=5)
    assert list(df.columns) == ["query_id", "rank", "doc_id", "score"]
    # the uncorrectable query contributes no rows; every other does
    got = set(df["query_id"])
    empties = {q["query_id"] for q in TYPO2_QUERIES} - got
    assert empties == {3}
    # ranks tile 1..n per query, scores non-increasing within a query
    for qid, g in df.groupby("query_id"):
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 1e-12).all()
