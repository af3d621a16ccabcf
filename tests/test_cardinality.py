"""Cardinality aggregation: exact COUNT(DISTINCT) per lang
(textstats.distinct_terms, oracle-gated in test_driver_gate.py) and the
HyperLogLog sketch scale path (functions/hll.py +
textstats.cardinality_hll)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from torchtrajectory_ray.functions.hll import (
    DEFAULT_P,
    hll_add_hashes,
    hll_estimate,
    hll_init,
    hll_merge,
)
from torchtrajectory_ray.functions.text import term_hash

SF = "/root/testdata/sf0.001"


def _hashes(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vals = {f"t{seed}_{i}" for i in rng.integers(0, n * 4, size=n * 2)}
    return np.fromiter((term_hash(v) for v in vals), np.uint64, len(vals))


# ------------------------------------------------------------------ kernel


def test_hll_error_bound_high_cardinality():
    # 1.04/sqrt(4096) ~= 1.6 % std error; 3 sigma ~= 4.9 %
    for seed in (1, 2, 3):
        h = _hashes(60_000, seed)
        regs = hll_init()
        hll_add_hashes(regs, h)
        est = hll_estimate(regs)
        assert abs(est / len(h) - 1.0) < 0.05, (seed, est, len(h))


def test_hll_small_range_linear_counting():
    h = _hashes(100, 9)
    regs = hll_init()
    hll_add_hashes(regs, h)
    # the linear-counting regime is near-exact at n << m
    assert abs(hll_estimate(regs) / len(h) - 1.0) < 0.02


def test_hll_merge_equals_one_shot_and_is_order_free():
    h = _hashes(20_000, 4)
    one = hll_init()
    hll_add_hashes(one, h)
    # split into uneven chunks, fold in reverse order
    chunks = np.array_split(h, 7)
    merged = hll_init()
    for c in reversed(chunks):
        part = hll_init()
        hll_add_hashes(part, c)
        merged = hll_merge(merged, part)
    assert np.array_equal(one, merged)
    # duplicates across chunks change nothing (idempotent max)
    again = hll_merge(merged, merged)
    assert np.array_equal(again, merged)


def test_hll_pure_function_of_distinct_set():
    h = _hashes(5_000, 5)
    rng = np.random.default_rng(0)
    a, b = hll_init(), hll_init()
    hll_add_hashes(a, h)
    hll_add_hashes(b, rng.permutation(np.concatenate([h, h[: len(h) // 2]])))
    assert np.array_equal(a, b)


def test_hll_empty_and_size_guard():
    regs = hll_init()
    hll_add_hashes(regs, np.empty(0, dtype=np.uint64))
    assert hll_estimate(regs) == 0.0
    with pytest.raises(ValueError, match="sizes differ"):
        hll_merge(hll_init(10), hll_init(12))


# ---------------------------------------------------------------- pipelines


def test_distinct_terms_matches_brute_force(ray_session):
    from torchtrajectory_ray.pipelines.textstats import distinct_terms

    got = distinct_terms(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text", "lang"])
    exp = (
        docs.assign(term=docs["text"].str.split(" "))
        .explode("term")
        .groupby("lang")["term"]
        .nunique()
        .reset_index(name="n_terms")
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_terms": np.int64}), check_dtype=True
    )


def test_cardinality_hll_tracks_exact_and_is_deterministic(ray_session):
    from torchtrajectory_ray.pipelines.textstats import (
        cardinality_hll,
        distinct_terms,
    )

    exact = distinct_terms(SF).set_index("lang")["n_terms"]
    est = cardinality_hll(SF)
    est2 = cardinality_hll(SF)
    pd.testing.assert_frame_equal(est, est2)  # deterministic
    assert list(est["lang"]) == sorted(exact.index)
    for lang, e in zip(est["lang"], est["n_terms_est"]):
        # tiny vocab => linear-counting regime, near exact
        assert abs(e / exact[lang] - 1.0) < 0.05, (lang, e, exact[lang])


def test_hll_rho_exact_near_power_of_two():
    # review regression: floor(log2) overstated bit_length for w just
    # below 2^k (k >= 49); frexp must give the exact rho
    p = DEFAULT_P
    suffix_bits = 63 - p
    for w in (2**50 - 1, 2**49 - 1, 2**50, 1, 2**51 - 1):
        h = np.asarray([(w << p) | 5], dtype=np.uint64)
        regs = hll_init(p)
        hll_add_hashes(regs, h)
        expected = suffix_bits - int(w).bit_length() + 1
        assert int(regs[5]) == expected, (w, int(regs[5]), expected)
