"""Misra-Gries heavy hitters (functions/heavyhitters.py) and the
sketch-then-verify exact top-k pipeline (textstats.heavy_terms, oracle-
gated in test_driver_gate.py): the summary guarantee must hold on
arbitrary chunkings, and the pipeline must be EXACT whenever it does not
fail loud."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from torchtrajectory_ray.functions.heavyhitters import (
    mg_fold,
    mg_merge,
    mg_summary,
)


def _zipf_stream(n: int, vocab: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=n)
    ranks = ranks[ranks <= vocab]
    return np.asarray([f"t{r}" for r in ranks], dtype=object)


def _true_counts(stream: np.ndarray) -> dict[str, int]:
    t, c = np.unique(stream, return_counts=True)
    return dict(zip(t, (int(x) for x in c)))


@pytest.mark.parametrize("m,chunks", [(16, 5), (64, 9), (16, 1)])
def test_mg_guarantee_holds_under_any_chunking(m, chunks):
    stream = _zipf_stream(30_000, 2_000, seed=m + chunks)
    true = _true_counts(stream)
    summaries = []
    for part in np.array_split(stream, chunks):
        t, c = np.unique(part, return_counts=True)
        summaries.append(dict(zip(t, (int(x) for x in c))))
    mg_sums = []
    deficit0 = 0
    for s in summaries:
        terms = np.asarray(list(s), dtype=object)
        counts = np.asarray(list(s.values()), dtype=np.int64)
        red, d = mg_summary(terms, counts, m)
        mg_sums.append(red)
        deficit0 += d
    acc, deficit = mg_fold(mg_sums, m)
    deficit += deficit0
    assert len(acc) <= m
    assert deficit <= len(stream) // (m + 1) + 1
    for term, est in acc.items():
        assert true[term] - deficit <= est <= true[term], term
    dropped = set(true) - set(acc)
    assert all(true[t] <= deficit for t in dropped)


def test_mg_merge_respects_counter_budget():
    a = {f"a{i}": i + 1 for i in range(30)}
    b = {f"b{i}": i + 1 for i in range(30)}
    merged, d = mg_merge(a, b, 16)
    assert len(merged) <= 16 and d > 0
    same, d0 = mg_merge(a, {}, 64)
    assert same == a and d0 == 0


def _write_corpus(tmp_path, texts: list[str]) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "hh"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_heavy_terms_exact_on_large_vocab(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.textstats import heavy_terms

    rng = np.random.default_rng(1)
    stream = _zipf_stream(120_000, 20_000, seed=1)
    texts = [
        " ".join(chunk)
        for chunk in np.array_split(stream, 300)
    ]
    sf = _write_corpus(tmp_path, texts)
    got = heavy_terms(sf, k=10, m=512)  # vocab >> m: summaries truncate
    true = _true_counts(stream)
    exp = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["term"], got["n"])) == exp
    assert got["rank"].tolist() == list(range(1, 11))


def test_heavy_terms_fails_loud_when_unprovable(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.textstats import heavy_terms

    # near-uniform counts: a tiny m cannot separate anything
    texts = [" ".join(f"w{i}" for i in range(200)) for _ in range(30)]
    sf = _write_corpus(tmp_path, texts)
    with pytest.raises(ValueError, match="retry with m"):
        heavy_terms(sf, k=5, m=8)


def test_heavy_terms_fails_loud_on_unprovable_kth(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines.textstats import heavy_terms

    # a few clear heavies + a near-uniform tail: the summary keeps
    # candidates, but the k-th count cannot dominate the deficit
    rng = np.random.default_rng(2)
    stream = np.asarray(
        ["big1"] * 3000 + ["big2"] * 2500
        + [f"w{i}" for i in rng.integers(0, 400, size=20_000)],
        dtype=object,
    )
    texts = [" ".join(c) for c in np.array_split(rng.permutation(stream), 60)]
    sf = _write_corpus(tmp_path, texts)
    with pytest.raises(ValueError, match="retry with m"):
        heavy_terms(sf, k=10, m=16)
    # and the same corpus IS provable at an adequate m
    got = heavy_terms(sf, k=2, m=2048)
    assert got["term"].tolist() == ["big1", "big2"]
    assert got["n"].tolist() == [3000, 2500]


def test_heavy_terms_per_lang_exact_and_fail_loud(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines.textstats import heavy_terms_per_lang

    rng = np.random.default_rng(4)
    rows = []
    for lang, seed in (("en", 1), ("de", 2)):
        stream = _zipf_stream(40_000, 5_000, seed=seed)
        for chunk in np.array_split(stream, 80):
            rows.append((lang, " ".join(chunk)))
    d = tmp_path / "hhg"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "lang": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = heavy_terms_per_lang(str(d), k=5, m=512)  # vocab >> m per lang
    for lang, seed in (("en", 1), ("de", 2)):
        true = _true_counts(_zipf_stream(40_000, 5_000, seed=seed))
        exp = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        g = got[got["lang"] == lang]
        assert list(zip(g["term"], g["n"])) == exp, lang
        assert g["rank"].tolist() == [1, 2, 3, 4, 5]
    # per-group fail-loud: a uniform lang cannot be proven at tiny m
    uni = [("fr", " ".join(f"u{i}" for i in range(300))) for _ in range(20)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(uni)), pa.int64()),
                "lang": pa.array([r[0] for r in uni], pa.string()),
                "text": pa.array([r[1] for r in uni], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    with pytest.raises(ValueError, match=r"heavy_terms_per_lang\[fr\]"):
        heavy_terms_per_lang(str(d), k=5, m=8)
