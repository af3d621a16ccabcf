"""Exact distributed histogram quantiles (length_deciles)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _lens_ds(vals):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(vals)), pa.int64()),
                "n_tokens": pa.array(vals, pa.int64()),
            }
        )
    ).repartition(4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_histogram_quantiles_match_sorted_indexing(ray_session, seed):
    from torchtrajectory_ray.pipelines.textstats import (
        length_quantile_thresholds,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(1, 40, size=rng.integers(5, 500)).tolist()
    probs = [k / 10 for k in range(1, 10)] + [0.05, 0.24, 0.999]
    got = length_quantile_thresholds(_lens_ds(vals), probs)
    s = np.sort(vals)
    exp = [
        int(s[int(np.ceil(np.float64(p) * len(s))) - 1]) for p in probs
    ]
    assert got.tolist() == exp


def test_quantiles_degenerate_all_equal(ray_session):
    from torchtrajectory_ray.pipelines.textstats import (
        length_quantile_thresholds,
    )

    got = length_quantile_thresholds(
        _lens_ds([7] * 50), [k / 10 for k in range(1, 10)]
    )
    assert got.tolist() == [7] * 9


def test_length_deciles_balanced_buckets(ray_session):
    from torchtrajectory_ray.pipelines import textstats

    df = textstats.length_deciles(SF).to_pandas()
    assert set(df["decile"]) <= set(range(10))
    # with many distinct lengths the buckets are near-balanced: no
    # bucket larger than 2x the ideal share (ties can skew slightly)
    counts = df["decile"].value_counts()
    assert counts.max() <= 2 * len(df) / 10
    # decile = #{thresholds < n} is monotone non-decreasing in n_tokens
    mono = df.sort_values("n_tokens")["decile"].diff().dropna()
    assert (mono >= 0).all()
    # docs sharing a token count share a decile
    assert (df.groupby("n_tokens")["decile"].nunique() == 1).all()
