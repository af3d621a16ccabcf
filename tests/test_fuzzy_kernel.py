"""Vectorized edit-distance-1 kernel vs reference DP Levenshtein."""

from __future__ import annotations

import itertools

import numpy as np

from torchtrajectory_ray.functions.fuzzy import edit1_mask, levenshtein_ref


def test_edit1_exhaustive_small_alphabet():
    words = [""] + [
        "".join(p)
        for n in range(1, 5)
        for p in itertools.product("ab", repeat=n)
    ]
    arr = np.asarray(words, dtype=object)
    for q in words:
        got = edit1_mask(q, arr)
        exp = np.asarray([levenshtein_ref(q, w) <= 1 for w in words])
        assert (got == exp).all(), q


def test_edit1_random_longer_words():
    import random

    rng = random.Random(11)
    vocab = [
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 12)))
        for _ in range(2000)
    ]
    arr = np.asarray(vocab, dtype=object)
    for q in ["abcdefg", "hh", "a", "", "abcdefghijklm"]:
        got = edit1_mask(q, arr)
        exp = np.asarray([levenshtein_ref(q, w) <= 1 for w in vocab])
        assert (got == exp).all(), q


def test_edit1_unicode_and_empty():
    arr = np.asarray(["", "ü", "üx", "üy", "xü", "u"], dtype=object)
    got = edit1_mask("ü", arr)
    assert got.tolist() == [True, True, True, True, True, True]
    assert edit1_mask("", arr).tolist() == [True, True, False, False, False, True]
