"""DSIR importance-weighted data selection (Xie et al. 2023): planted
domain-signal recovery, hashed-feature scale path, and edge cases.  The
sf0.01 oracle gate for `dsir_weights` runs in test_driver_gate.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from torchtrajectory_ray.pipelines.lm import dsir_weights_ds


def _ds(rows: list[tuple[int, str, str]]):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    return lambda: ray.data.from_arrow(t)


def test_dsir_prefers_target_like_docs(ray_session):
    # target (en) docs share the bigram "alpha beta"; others use "x y".
    rows = [(i, "en", "alpha beta alpha beta gamma") for i in range(6)]
    rows += [(10 + i, "fr", "x y x y z") for i in range(6)]
    # probe docs: one target-like, one raw-like, both OUT of the target set
    rows += [(100, "de", "alpha beta alpha beta gamma")]
    rows += [(101, "de", "x y x y z")]
    w = (
        dsir_weights_ds(_ds(rows), target_lang="en")
        .to_pandas()
        .set_index("doc_id")["logw"]
    )
    assert w[100] > w[101], "target-like doc must outweigh raw-like doc"
    assert w[0] > 0 > w[10]


def test_dsir_hashed_mode_is_deterministic_and_bounded(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(50)]
    rows = [
        (i, "en" if i % 2 else "fr",
         " ".join(rng.choice(vocab, size=rng.integers(5, 30))))
        for i in range(80)
    ]
    a = dsir_weights_ds(_ds(rows), n_buckets=64).to_pandas()
    b = dsir_weights_ds(_ds(rows), n_buckets=64).to_pandas()
    assert a.equals(b)
    assert len(a) == 80 and (a["n_feats"] >= 0).all()
    # hashing collapses features but keeps the broad ordering signal:
    # exact and hashed weights must correlate positively
    exact = dsir_weights_ds(_ds(rows)).to_pandas()
    m = a.merge(exact, on="doc_id", suffixes=("_h", "_e"))
    assert np.corrcoef(m["logw_h"], m["logw_e"])[0, 1] > 0.5


def test_dsir_edges(ray_session):
    # docs with < 2 tokens carry no bigrams: n_feats 0, logw 0
    rows = [(0, "en", "solo"), (1, "fr", "a b a b")]
    w = dsir_weights_ds(_ds(rows)).to_pandas().set_index("doc_id")
    assert w.loc[0, "n_feats"] == 0 and w.loc[0, "logw"] == 0.0
    assert w.loc[1, "n_feats"] == 3
    # no target docs at all: weights still defined (smoothing only)
    w2 = dsir_weights_ds(_ds(rows), target_lang="zz").to_pandas()
    assert len(w2) == 2 and np.isfinite(w2["logw"]).all()


def test_dsir_select_top_fraction(ray_session):
    from torchtrajectory_ray.pipelines.lm import dsir_select_ds

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(40)]
    rows = [
        (i, "en" if i % 2 else "fr",
         " ".join(rng.choice(vocab, size=rng.integers(5, 30))))
        for i in range(100)
    ]
    kept = dsir_select_ds(_ds(rows), frac=0.3).to_pandas()
    w = dsir_weights_ds(_ds(rows)).to_pandas()
    # kept = exactly the docs at/above the (1-frac) discrete quantile
    thr = np.sort(w["logw"].to_numpy())[int(np.ceil(0.7 * len(w))) - 1]
    expect = set(w.loc[w["logw"] >= thr, "doc_id"])
    assert set(kept["doc_id"]) == expect
    assert len(kept) >= 30  # at least the fraction (ties may add)
    # frac=1 keeps everything; bad frac fails loud
    assert len(dsir_select_ds(_ds(rows), frac=1.0).to_pandas()) == 100
    import pytest

    with pytest.raises(ValueError, match="frac"):
        dsir_select_ds(_ds(rows), frac=0.0)


def test_dsir_fit_score_cross_pile(ray_session):
    from torchtrajectory_ray.pipelines.lm import dsir_fit_ds, dsir_score_ds

    train = [(i, "en", "alpha beta gamma delta") for i in range(5)]
    train += [(10 + i, "fr", "x y z w") for i in range(5)]
    model = dsir_fit_ds(_ds(train))
    # scoring the training pile == the one-shot weights entry
    a = dsir_score_ds(_ds(train), model).to_pandas().sort_values("doc_id")
    b = dsir_weights_ds(_ds(train)).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # an external pile: known bigrams score, unseen bigrams contribute 0
    new = [(100, "de", "alpha beta gamma delta"),   # all target bigrams
           (101, "de", "x y z w"),                  # all raw-only bigrams
           (102, "de", "qq rr ss tt")]              # fully OOV
    s = dsir_score_ds(_ds(new), model).to_pandas().set_index("doc_id")
    assert s.loc[100, "logw"] > 0 > s.loc[101, "logw"]
    assert s.loc[102, "logw"] == 0.0 and s.loc[102, "n_feats"] == 3
