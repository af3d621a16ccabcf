"""Trigram / sorted-prefix dictionary-scan acceleration
(state/dictscan.py): the pattern-analysis planner must only ever claim
SOUND required literals, and the accelerated engine scans must be
bit-identical to the naive full scan on every pattern class — the
pruning is an optimization, never a semantic."""

from __future__ import annotations

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from torchtrajectory_ray.functions.text import glob_to_regex
from torchtrajectory_ray.pipelines.corpus import (
    REGEX_QUERIES,
    WILDCARD_QUERIES,
    _engine,
    documents_index,
)
from torchtrajectory_ray.state.dictscan import (
    DictScanIndex,
    analyze_glob,
    analyze_regex,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- planner


def test_analyze_glob_plans():
    p = analyze_glob("sp*")
    assert p.prefix == "sp" and p.runs == ("sp",)
    p = analyze_glob("?able")
    assert p.prefix == "" and p.runs == ("able",)
    p = analyze_glob("w?ndow*")
    assert p.prefix == "w" and p.runs == ("w", "ndow")
    p = analyze_glob("*abc")
    assert p.prefix == "" and p.runs == ("abc",)
    p = analyze_glob("abc")  # no wildcard: the whole term is the prefix
    assert p.prefix == "abc" and p.runs == ("abc",)


def test_analyze_regex_prefix_soundness():
    # the canonical trap: a quantifier on the FIRST literal means the
    # later run must NOT be claimed as a start anchor
    p = analyze_regex("a?bc")
    assert p.prefix == "" and p.runs == ("bc",)
    p = analyze_regex("ab*c")
    assert p.prefix == "a" and set(p.runs) == {"a", "c"}
    p = analyze_regex("ab+c")  # + keeps its atom required
    assert p.prefix == "ab" and set(p.runs) == {"ab", "c"}
    p = analyze_regex("zzz.+")
    assert p.prefix == "zzz" and p.runs == ("zzz",)
    p = analyze_regex(".*ble")
    assert p.prefix == "" and p.runs == ("ble",)
    p = analyze_regex("[st]..")
    assert p.prefix == "" and p.runs == ()
    p = analyze_regex(r"a\.b")  # escaped punctuation is literal
    assert p.prefix == "a.b" and p.runs == ("a.b",)
    p = analyze_regex(r"a\db")  # class shorthand breaks the run
    assert p.prefix == "a" and set(p.runs) == {"a", "b"}
    p = analyze_regex("ab{2,3}c")  # counted repeat trims like '*'
    assert p.prefix == "a" and set(p.runs) == {"a", "c"}


def test_analyze_regex_bails_on_unhandled():
    for pat in ("a|b", "(ab)c", "a(?:b)c"):
        p = analyze_regex(pat)
        assert p.prefix == "" and p.runs == () and not p.exhaustive


def _naive(terms, rx):
    return sorted(t for t in terms if rx.fullmatch(t))


def test_planner_claims_hold_on_random_vocab():
    # every plan claim (prefix / contained runs) must hold for every
    # actual regex match — checked over a vocab dense enough to hit
    # the pattern shapes
    rng = np.random.default_rng(7)
    alphabet = "abcz."
    vocab = {
        "".join(rng.choice(list(alphabet), size=rng.integers(1, 8)))
        for _ in range(400)
    }
    patterns = [
        "a?bc", "ab*c", "ab+c", "a.c", "a.*c", "abc{1,2}", r"a\.b",
        "zzz.+", ".*ble", "a[bc]z", "abc", "a$", "^ab",
    ]
    for pat in patterns:
        rx = re.compile(pat)
        plan = analyze_regex(pat)
        for t in vocab:
            if rx.fullmatch(t):
                assert t.startswith(plan.prefix), (pat, t, plan)
                for run in plan.runs:
                    assert run in t, (pat, t, plan)


# ----------------------------------------------------- index scan identity


@pytest.fixture(scope="module")
def vocab_index():
    rng = np.random.default_rng(11)
    alphabet = "abcdez"
    vocab = sorted(
        {
            "".join(rng.choice(list(alphabet), size=rng.integers(1, 9)))
            for _ in range(600)
        }
        | {"spark", "sp", "table", "cable", "window", "windows", "scan"}
    )
    return vocab, DictScanIndex(vocab)


def test_scan_regex_identity_all_pattern_classes(vocab_index):
    vocab, idx = vocab_index
    patterns = [
        "sp.*", ".*ble", "[sc]..", "zzz.+", "a?bc", "ab*c", "ab+c",
        "wind.w", "w.ndow.*", "a|b", "(ab)c", "abc{1,2}", ".*", "spark",
        r"c\wble", "", "z+",
    ]
    for pat in patterns:
        rx = re.compile(pat)
        got = idx.scan_regex(rx, analyze_regex(pat))
        assert got == _naive(vocab, rx), pat


@settings(max_examples=150, deadline=None)
@given(
    pat=st.text(alphabet="abz*?", min_size=0, max_size=8),
)
def test_scan_glob_identity_property(pat, vocab_index):
    vocab, idx = vocab_index
    rx = re.compile(glob_to_regex(pat))
    got = idx.scan_regex(rx, analyze_glob(pat))
    assert got == _naive(vocab, rx)


def test_prefix_scan_identity(vocab_index):
    vocab, idx = vocab_index
    for prefix in ("", "a", "ab", "spark", "zzzz", "wind"):
        assert idx.scan_prefix(prefix) == sorted(
            t for t in vocab if t.startswith(prefix)
        )


def test_pruning_actually_prunes(vocab_index):
    vocab, idx = vocab_index
    # a selective pattern must verify far fewer candidates than |vocab|
    cand = idx.candidates(analyze_regex("wind.w.*"))
    assert cand is not None and 0 < len(cand) < len(vocab) // 4
    # an unanalyzable pattern yields no candidate set (full scan)
    assert idx.candidates(analyze_regex("[st]..")) is None


# ------------------------------------------------------- engine integration


def test_engine_scans_match_naive_on_gate_index(ray_session):
    eng = _engine(documents_index(SF))
    for q in REGEX_QUERIES:
        pat = q["pattern"]
        assert eng.regex_terms(pat) == eng._regex_terms_scan(pat), pat
    for q in WILDCARD_QUERIES:
        pat = q["pattern"]
        assert eng.wildcard_terms(pat) == eng._regex_terms_scan(
            glob_to_regex(pat)
        ), pat
    # prefix bisect == naive startswith scan (suggest builds on this)
    for prefix in ("sp", "a", "zzz", ""):
        assert eng.prefix_terms(prefix) == sorted(
            t for t in eng._terms if t.startswith(prefix)
        ), prefix


def test_regex_escape_classes_are_sound(vocab_index):
    # review regression: \x41-style multi-char escapes and \t must NOT be
    # treated as "literal next char" — the planner either understands the
    # escape or bails, never claims a wrong literal
    vocab = ["abc", "a\tb", "x61bc", "tab"]
    idx = DictScanIndex(vocab)
    for pat in (r"\x61bc", r"a\tb", r"\N{BULLET}?abc", r"a\x20*b"):
        rx = re.compile(pat)
        assert idx.scan_regex(rx, analyze_regex(pat)) == _naive(vocab, rx), pat


def test_prefix_range_handles_max_code_point():
    hi_char = chr(0x10FFFF)
    vocab = ["ab", "abc", f"ab{hi_char}", f"ab{hi_char}x", hi_char]
    idx = DictScanIndex(vocab)
    assert idx.scan_prefix("ab") == sorted(
        t for t in vocab if t.startswith("ab")
    )
    assert idx.scan_prefix(hi_char) == [hi_char]
    assert idx.scan_prefix("") == sorted(vocab)
