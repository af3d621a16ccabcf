"""MinHash-LSH / SimHash near-dup detection: planted-duplicate recall,
signature determinism, jaccard estimation quality."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from torchtrajectory_ray.pipelines import dedup


def _planted_corpus() -> pa.Table:
    rng = np.random.default_rng(7)
    vocab = [f"t{i:03d}" for i in range(400)]
    texts, ids = [], []
    for i in range(40):
        toks = [vocab[j] for j in rng.integers(0, 400, 60)]
        ids.append(i)
        texts.append(" ".join(toks))
    # planted near-dups: docs 100/101 each differ by ONE token from doc 0
    # (and by two from each other)
    base = texts[0].split(" ")
    for j, did in enumerate((100, 101)):
        mod = list(base)
        mod[5 + j] = "changed"
        ids.append(did)
        texts.append(" ".join(mod))
    # exact dup of doc 1
    ids.append(200)
    texts.append(texts[1])
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_minhash_finds_planted_pairs(ray_session):
    tbl = _planted_corpus()
    cand = dedup.minhash_candidates(ray.data.from_arrow(tbl))
    pairs = set(map(tuple, cand[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 100) in pairs
    assert (0, 101) in pairs
    assert (1, 200) in pairs


def test_minhash_signature_deterministic_across_batches():
    mh = dedup.MinHasher()
    toks = [f"w{i}" for i in range(50)]
    s1 = mh.signatures([toks])[0]
    # different batch composition, fresh actor
    mh2 = dedup.MinHasher()
    s2 = mh2.signatures([["other", "doc"], toks, ["x"] * 3])[1]
    assert np.array_equal(s1, s2)


def test_minhash_estimates_jaccard():
    """Signature agreement rate approximates the true shingle jaccard."""
    mh = dedup.MinHasher(num_perm=128, bands=32)
    rng = np.random.default_rng(3)
    a = [f"w{i}" for i in rng.integers(0, 500, 80)]
    b = list(a)
    b[10:20] = [f"q{i}" for i in range(10)]  # mutate a slice
    sa, sb = mh.signatures([a, b])
    est = float(np.mean(sa == sb))
    ja = dedup.exact_jaccard(a, b)
    assert abs(est - ja) < 0.2


def test_minhash_short_and_empty_docs():
    mh = dedup.MinHasher(shingle_k=3)
    sigs = mh.signatures([[], ["one"], ["one", "two"], ["a", "b", "c", "d"]])
    assert np.all(sigs[0] == 0)
    assert sigs[1].any() and sigs[2].any() and sigs[3].any()
    # identical short docs agree
    again = mh.signatures([["one", "two"]])[0]
    assert np.array_equal(sigs[2], again)


def test_simhash_batch_equals_single():
    sh = dedup.SimHasher()
    docs = [["the", "cat", "sat"], ["a", "b", "a", "c"], [], ["zzz"]]
    batch_sigs = sh._signatures(docs)
    for i, d in enumerate(docs):
        assert int(batch_sigs[i]) == dedup.SimHasher().simhash(d)


def test_simhash_near_dup_low_hamming():
    sh = dedup.SimHasher()
    a = [f"w{i}" for i in range(100)]
    b = list(a)
    b[3] = "changed"
    sa, sb = sh._signatures([a, b])
    ham = bin(int(sa) ^ int(sb)).count("1")
    assert ham <= 10


def test_verify_pairs_distributed_matches_reference(ray_session, tmp_path):
    """Pair-partitioned verification (pushdown doc reads inside tasks)
    must return exactly the pairs the per-pair reference accepts."""
    import itertools

    import pandas as pd
    import pyarrow.parquet as pq

    tbl = _planted_corpus()
    src = str(tmp_path / "documents.parquet")
    pq.write_table(tbl, src)
    ids = tbl["doc_id"].to_pylist()
    texts = dict(zip(ids, tbl["text"].to_pylist()))
    cand = pd.DataFrame(
        [(a, b) for a, b in itertools.combinations(sorted(ids), 2)],
        columns=["doc_a", "doc_b"],
    )
    for thr in (0.5, 0.9):
        got = dedup.verify_pairs([src], cand, thr)
        exp = sorted(
            (a, b)
            for a, b in itertools.combinations(sorted(ids), 2)
            if dedup.exact_jaccard(
                texts[a].split(" "), texts[b].split(" ")
            ) >= thr
        )
        assert sorted(map(tuple, got[["doc_a", "doc_b"]].to_numpy())) == exp
        # jaccard values match the reference to rounding
        for a, b, j in got.itertuples(index=False):
            assert abs(
                j - dedup.exact_jaccard(texts[a].split(" "), texts[b].split(" "))
            ) < 1e-6


def test_verify_pairs_accepts_dataset_source(ray_session):
    """Dataset input stays supported (staged then verified distributed)."""
    import pandas as pd

    tbl = _planted_corpus()
    cand = pd.DataFrame({"doc_a": [0, 1], "doc_b": [100, 200]})
    got = dedup.verify_pairs(ray.data.from_arrow(tbl), cand, 0.5)
    assert (0, 100) in set(map(tuple, got[["doc_a", "doc_b"]].to_numpy()))
    assert (1, 200) in set(map(tuple, got[["doc_a", "doc_b"]].to_numpy()))
