"""Bloom filter kernel properties + the bloom-prefiltered semi-join's
exactness guarantee (the filter only prunes; the co-partitioned verify
makes the join exact regardless of false-positive rate).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from torchtrajectory_ray.functions.bloom import (
    bloom_add,
    bloom_or,
    bloom_params,
    bloom_test,
    bloom_zero,
)

SF_SMALL = "/root/testdata/sf0.001"


def test_bloom_never_false_negative():
    rng = np.random.default_rng(7)
    for n in (1, 10, 1000, 30_000):
        keys = rng.choice(2**62, n, replace=False).astype(np.int64)
        m, k = bloom_params(n, 10)
        w = bloom_zero(m)
        bloom_add(w, keys, k)
        assert bloom_test(w, keys, k).all()


def test_bloom_fp_rate_near_theory():
    rng = np.random.default_rng(11)
    keys = rng.choice(2**62, 20_000, replace=False).astype(np.int64)
    m, k = bloom_params(len(keys), 10)
    w = bloom_zero(m)
    bloom_add(w, keys, k)
    probe = rng.choice(2**62, 200_000).astype(np.int64)
    probe = probe[~np.isin(probe, keys)]
    fp = float(bloom_test(w, probe, k).mean())
    # 10 bits/key theory ≈ 0.0082; allow generous slack for variance
    assert fp < 0.03


def test_bloom_or_equals_single_build():
    rng = np.random.default_rng(13)
    keys = rng.choice(2**62, 5000, replace=False).astype(np.int64)
    m, k = bloom_params(len(keys), 10)
    whole = bloom_zero(m)
    bloom_add(whole, keys, k)
    parts = []
    for chunk in np.array_split(keys, 7):
        p = bloom_zero(m)
        bloom_add(p, chunk, k)
        parts.append(p)
    assert np.array_equal(bloom_or(parts), whole)


def test_bloom_negative_keys_and_empty():
    keys = np.array([-5, -1, 0, 2**40, -(2**40)], np.int64)
    m, k = bloom_params(len(keys), 12)
    w = bloom_zero(m)
    bloom_add(w, keys, k)
    assert bloom_test(w, keys, k).all()
    assert bloom_test(w, np.zeros(0, np.int64), k).shape == (0,)
    bloom_add(w, np.zeros(0, np.int64), k)  # no-op


def _oracle(sf_dir):
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(
        """SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
           FROM orders WHERE o_custkey IN (
             SELECT c_custkey FROM customer
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA')"""
    ).df()


def _canon(df):
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


def test_semijoin_exact_even_with_saturated_bloom(ray_session):
    """bits_per_key=1 saturates the filter (fp rate near 100%), so the
    prefilter passes almost everything — the exchange verify must still
    return EXACTLY the semi-join, proving correctness never depends on
    bloom quality."""
    from torchtrajectory_ray.pipelines.analytics import region_orders_semijoin

    got = region_orders_semijoin(SF_SMALL, bits_per_key=1).to_pandas()
    want = _oracle(SF_SMALL)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_semijoin_default_matches_oracle(ray_session):
    from torchtrajectory_ray.pipelines.analytics import region_orders_semijoin

    got = region_orders_semijoin(SF_SMALL).to_pandas()
    want = _oracle(SF_SMALL)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_semijoin_empty_region(ray_session):
    from torchtrajectory_ray.pipelines.analytics import region_orders_semijoin

    got = region_orders_semijoin(SF_SMALL, region="NO_SUCH_REGION").to_pandas()
    assert len(got) == 0


def test_bm25f_ta_equals_exhaustive_merge(ray_session):
    """Fagin's TA early-termination must return EXACTLY the ranking an
    exhaustive union-resolve produces: score every doc in either
    field's OR candidate set via explain_docs and compare."""
    import numpy as np

    from torchtrajectory_ray.pipelines.corpus import (
        WEB_QUERIES,
        _engine,
        _ta_topk,
        documents_field_index,
    )

    et = _engine(documents_field_index(SF_SMALL, "title"))
    eb = _engine(documents_field_index(SF_SMALL, "body"))
    for q in WEB_QUERIES[:4]:
        terms = q["terms"]
        ta = _ta_topk(et, eb, terms, 10, 2.0, 1.0)
        cand = set(et.bool_or(terms).tolist()) | set(eb.bool_or(terms).tolist())
        score = {d: 0.0 for d in cand}
        for eng, w in ((et, 2.0), (eb, 1.0)):
            for r in eng.explain_docs(terms, sorted(cand)):
                score[r["doc_id"]] += w * r["contrib"]
        brute = sorted(((s, -d) for d, s in score.items()), reverse=True)
        want = [(-nd, s) for s, nd in brute[:10]]
        got = ta[:10]
        assert [d for d, _ in got] == [d for d, _ in want], q["query_id"]
        assert np.allclose(
            [s for _, s in got], [s for _, s in want], rtol=0, atol=1e-12
        )


def test_bm25f_title_only_weight_matches_title_index(ray_session):
    """w_body = 0 reduces BM25F to the title index's own ranking
    (scores scaled by w_title)."""
    from torchtrajectory_ray.pipelines.corpus import (
        WEB_QUERIES,
        _engine,
        _ta_topk,
        documents_field_index,
    )

    et = _engine(documents_field_index(SF_SMALL, "title"))
    eb = _engine(documents_field_index(SF_SMALL, "body"))
    q = WEB_QUERIES[0]
    ta = _ta_topk(et, eb, q["terms"], 10, 3.0, 0.0)
    own = et.topk(q["terms"], k=10)
    assert [d for d, _ in ta[:10]] == [d for d, _ in own]
    for (d1, s1), (d2, s2) in zip(ta[:10], own):
        assert abs(s1 - 3.0 * s2) < 1e-9
