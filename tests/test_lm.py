"""Unigram-LM quality scoring and TF-IDF keyword extraction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs_factory(rows):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    # from_arrow is ONE block; repartition to exercise cross-block stats
    return lambda: ray.data.from_arrow(tbl).repartition(3)


def test_lm_quality_exact_golden(ray_session):
    from torchtrajectory_ray.pipelines.lm import lm_quality_ds

    rows = [(1, "a a b"), (2, "b c")]
    # counts: a=2 b=2 c=1, total=5
    df = (
        lm_quality_ds(_docs_factory(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    lp = {t: np.log(c / 5) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    exp1 = -(lp["a"] + lp["a"] + lp["b"]) / 3
    exp2 = -(lp["b"] + lp["c"]) / 2
    assert abs(df.loc[1, "nll"] - round(exp1, 6)) < 1e-9
    assert abs(df.loc[2, "nll"] - round(exp2, 6)) < 1e-9
    assert df["n_tokens"].tolist() == [3, 2]


def test_lm_quality_min_count_folds_tail_to_oov(ray_session):
    from torchtrajectory_ray.pipelines.lm import lm_quality_ds

    # a x4; singletons w x y z fold into one OOV bucket of mass 4
    rows = [(1, "a a a a"), (2, "w x y z")]
    df = (
        lm_quality_ds(_docs_factory(rows), min_count=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert abs(df.loc[1, "nll"] - round(-np.log(4 / 8), 6)) < 1e-9
    # each OOV token scores the whole folded mass, by design
    assert abs(df.loc[2, "nll"] - round(-np.log(4 / 8), 6)) < 1e-9


def test_doc_keywords_tf_idf_and_tiebreak(ray_session):
    from torchtrajectory_ray.pipelines.lm import doc_keywords_ds

    # "rare" df=1 beats "both" df=2; equal-score ties order term-asc
    rows = [(1, "rare both zeta alfa"), (2, "both other")]
    df = (
        doc_keywords_ds(_docs_factory(rows), n_docs=2, k=4)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d1 = df[df["doc_id"] == 1]
    # alfa/rare/zeta all tf=1 df=1 (score ln2) -> alphabetical; both last
    assert d1["term"].tolist() == ["alfa", "rare", "zeta", "both"]
    assert d1["rank"].tolist() == [1, 2, 3, 4]
    assert abs(d1.iloc[0]["score"] - round(np.log(2), 6)) < 1e-9
    assert d1.iloc[3]["score"] == 0.0  # df == n_docs -> idf 0


def test_doc_keywords_min_df_drops_rare_terms(ray_session):
    from torchtrajectory_ray.pipelines.lm import doc_keywords_ds

    rows = [(1, "shared unique1"), (2, "shared unique2")]
    df = doc_keywords_ds(
        _docs_factory(rows), n_docs=2, k=3, min_df=2
    ).to_pandas()
    assert set(df["term"]) == {"shared"}  # singletons skipped
    assert len(df) == 2


def test_doc_keywords_k_truncates(ray_session):
    from torchtrajectory_ray.pipelines.lm import doc_keywords_ds

    rows = [(1, "a b c d e"), (2, "zz")]
    df = doc_keywords_ds(_docs_factory(rows), n_docs=2, k=2).to_pandas()
    assert (df.groupby("doc_id").size() <= 2).all()
    assert (df["rank"] <= 2).all()
