"""Unordered-proximity search (NEAR/WITHIN): minimal-cover verification,
driver vs distributed path identity, phrase-containment invariant, and
the window sanity guard.  The sf0.01 oracle gate for the `near_match`
pipeline itself runs in test_driver_gate.py."""

from __future__ import annotations

import numpy as np
import pytest

from torchtrajectory_ray.pipelines import corpus
from torchtrajectory_ray.state.engine import _near_doc_hits, _phrase_doc_hits

SF = "/root/testdata/sf0.001"

_tok = str.split


def _brute_near(toks: list[str], terms: list[str], window: int) -> bool:
    """All unique terms inside some length-``window`` slice — O(n·w)."""
    uniq = sorted(set(terms))
    for i in range(len(toks)):
        win = set(toks[i : i + window])
        if all(t in win for t in uniq):
            return True
    return False


def test_near_doc_hits_matches_bruteforce():
    rng = np.random.default_rng(17)
    vocab = list("abcdefg")
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 40)))
        for _ in range(300)
    ]
    for terms, window in [
        (["a", "b"], 2),
        (["a", "b"], 5),
        (["a", "b", "c"], 3),
        (["a", "b", "c"], 7),
        (["a", "a", "b"], 2),  # duplicates collapse to the unique set
        (["g", "f", "e", "d"], 9),
    ]:
        got = _near_doc_hits(
            list(range(len(docs))), docs, terms, window, _tok
        )
        want = [
            i for i, d in enumerate(docs) if _brute_near(_tok(d), terms, window)
        ]
        assert got == want, (terms, window)


def test_near_tight_window_is_exact_adjacency():
    """window == #unique terms accepts only fully packed spans."""
    docs = ["x a b y", "a z b", "b a", "a y b a", "b x a b"]
    got = _near_doc_hits(list(range(5)), docs, ["a", "b"], 2, _tok)
    assert got == [0, 2, 3, 4]  # doc 1's best span is a..b = 3 tokens


def test_phrase_hits_are_near_hits():
    """Every consecutive match is a proximity match at window=len(p)."""
    rng = np.random.default_rng(23)
    vocab = list("abcd")
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 30)))
        for _ in range(200)
    ]
    ids = list(range(len(docs)))
    for p in [["a", "b"], ["c", "a", "d"]]:
        ph = set(_phrase_doc_hits(ids, docs, p, _tok))
        nr = set(_near_doc_hits(ids, docs, p, len(p), _tok))
        assert ph <= nr


def test_near_distributed_path_equals_driver_path(ray_session):
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    for q in corpus.NEAR_QUERIES:
        driver = eng.near_and(q["terms"], q["window"], distribute_over=10**9)
        dist = eng.near_and(q["terms"], q["window"], distribute_over=0)
        assert driver.tolist() == dist.tolist(), q


def test_near_match_pipeline_both_paths_agree(ray_session):
    auto = corpus.near_match(SF)
    forced = corpus.near_match(SF, distribute_over=0)
    assert auto.values.tolist() == forced.values.tolist()
    assert len(auto) > 0


def test_near_window_too_small_fails_loud(ray_session):
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    with pytest.raises(ValueError, match="window"):
        eng.near_and(["table", "hash", "scan"], 2)
    # duplicates collapse first: 2 unique terms fit a window of 2
    assert isinstance(eng.near_and(["table", "table", "hash"], 2), np.ndarray)


def test_near_candidate_cap_fails_loud(ray_session):
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    with pytest.raises(ValueError, match="max_candidates"):
        eng.near_and(["the", "a"], 10, max_candidates=5)


# --- ordered proximity (span-near in-order) -----------------------------------


def _brute_span(toks: list[str], terms: list[str], window: int) -> bool:
    """Exists strictly increasing positions matching ``terms`` in order
    with span <= window — O(n^len(terms)) recursive reference."""

    def rec(start: int, j: int, first: int | None) -> bool:
        if j == len(terms):
            return True
        for i in range(start, len(toks)):
            if toks[i] == terms[j]:
                if first is None:
                    if rec(i + 1, j + 1, i):
                        return True
                else:
                    if i - first + 1 > window:
                        return False
                    if rec(i + 1, j + 1, first):
                        return True
        return False

    return rec(0, 0, None)


def test_span_doc_hits_matches_bruteforce():
    from torchtrajectory_ray.state.engine import _span_doc_hits

    rng = np.random.default_rng(29)
    vocab = list("abcde")
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30)))
        for _ in range(300)
    ]
    ids = list(range(len(docs)))
    for terms, window in [
        (["a", "b"], 2),
        (["b", "a"], 2),
        (["a", "b"], 6),
        (["a", "b", "c"], 3),
        (["a", "b", "c"], 8),
        (["a", "a"], 4),        # repeated term: two distinct positions
        (["a", "a", "b"], 5),
    ]:
        got = _span_doc_hits(ids, docs, terms, window, _tok)
        want = [
            i for i, d in enumerate(docs) if _brute_span(_tok(d), terms, window)
        ]
        assert got == want, (terms, window)


def test_span_order_sensitivity_and_containment():
    """span ⊆ near at the same window; phrase ⊆ span at window=len(p);
    order reversal changes the result where only one order exists."""
    from torchtrajectory_ray.state.engine import _span_doc_hits

    docs = ["x a b y", "b z a", "a b a", "b x x a"]
    ids = list(range(4))
    ab = _span_doc_hits(ids, docs, ["a", "b"], 2, _tok)
    ba = _span_doc_hits(ids, docs, ["b", "a"], 2, _tok)
    assert ab == [0, 2]
    assert ba == [2]  # doc 1/3's b..a spans exceed the window
    rng = np.random.default_rng(31)
    vocab = list("abcd")
    rdocs = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 25)))
        for _ in range(200)
    ]
    rids = list(range(len(rdocs)))
    for p, w in [(["a", "b"], 3), (["c", "a", "d"], 6)]:
        ph = set(_phrase_doc_hits(rids, rdocs, p, _tok))
        sp = set(_span_doc_hits(rids, rdocs, p, w, _tok))
        spn = set(_span_doc_hits(rids, rdocs, p, len(p), _tok))
        nr = set(_near_doc_hits(rids, rdocs, p, w, _tok))
        assert ph <= spn and spn <= sp and sp <= nr


def test_span_distributed_path_equals_driver_path(ray_session):
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    for q in corpus.SPAN_QUERIES:
        driver = eng.span_near(q["terms"], q["window"], distribute_over=10**9)
        dist = eng.span_near(q["terms"], q["window"], distribute_over=0)
        assert driver.tolist() == dist.tolist(), q


def test_span_window_guard_fails_loud(ray_session):
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    # duplicates do NOT collapse for ordered spans: 3 slots needed
    with pytest.raises(ValueError, match="window"):
        eng.span_near(["table", "table", "hash"], 2)
