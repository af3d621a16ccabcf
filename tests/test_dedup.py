"""MinHash-LSH / SimHash near-dup detection: planted-duplicate recall,
signature determinism, jaccard estimation quality."""

from __future__ import annotations

import numpy as np
import pandas as pd
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


# --- exact all-pairs n-gram Jaccard (prefix filter) --------------------------


def _string_jaccard(ta: str, tb: str, k: int = 3) -> float:
    sa = set(dedup._shingle_strings(ta.split(" "), k))
    sb = set(dedup._shingle_strings(tb.split(" "), k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_equals_bruteforce(ray_session, tmp_path):
    """Prefix-filter AllPairs == the quadratic brute force, pairs AND
    values, at two thresholds (no LSH recall loss by construction)."""
    import itertools

    import pyarrow.parquet as pq

    tbl = _planted_corpus()
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    ids = tbl["doc_id"].to_pylist()
    texts = dict(zip(ids, tbl["text"].to_pylist()))
    for thr in (0.5, 0.9):
        got = dedup.ngram_jaccard_pairs(str(tmp_path), threshold=thr)
        exp = sorted(
            (a, b)
            for a, b in itertools.combinations(sorted(ids), 2)
            if _string_jaccard(texts[a], texts[b]) >= thr
        )
        assert sorted(map(tuple, got[["doc_a", "doc_b"]].to_numpy())) == exp
        for a, b, j in got.itertuples(index=False):
            assert abs(j - _string_jaccard(texts[a], texts[b])) < 1e-6
    assert len(exp) >= 1  # the planted corpus exercises nonempty output


def test_ngram_prefix_rows_prune(ray_session):
    """Prefix emission drops ~t of each doc's shingle rows, and shingles
    ranked frequent sort to the suffix (never emitted when the prefix is
    shorter than the rare count)."""
    tbl = _planted_corpus()
    full = dedup._prefix_rows_task(
        tbl, threshold=0.0, k=3, freq_rank={}
    )  # t=0 -> prefix = whole set
    pruned = dedup._prefix_rows_task(tbl, threshold=0.8, k=3, freq_rank={})
    assert 0 < pruned.num_rows < 0.4 * full.num_rows
    # mark one shingle of doc 0 frequent (by its 64-bit exchange key):
    # it must leave doc 0's prefix
    s0 = [
        h
        for h, d in zip(
            pruned["sh64"].to_pylist(), pruned["doc_id"].to_pylist()
        )
        if d == 0
    ]
    again = dedup._prefix_rows_task(
        tbl, threshold=0.8, k=3, freq_rank={s0[0]: 0}
    )
    s0b = {
        h
        for h, d in zip(
            again["sh64"].to_pylist(), again["doc_id"].to_pylist()
        )
        if d == 0
    }
    assert s0[0] not in s0b


def test_ngram_jaccard_fails_loud_on_degenerate_group(ray_session, tmp_path):
    """50 identical docs: every prefix shingle groups all of them — the
    exact answer is quadratic, and a small max_group must fail LOUD, not
    silently truncate."""
    import pyarrow.parquet as pq

    n = 50
    text = " ".join(f"w{i}" for i in range(30))
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([text] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="max_group"):
        dedup.ngram_jaccard_pairs(str(tmp_path), threshold=0.9, max_group=8)


def test_ngram_jaccard_sharding_independent(ray_session, tmp_path):
    """Same corpus as ONE file vs FOUR shards -> identical pairs (the
    global shingle order must not depend on batch/shard boundaries)."""
    import pyarrow.parquet as pq

    tbl = _planted_corpus()
    one = tmp_path / "one"
    four = tmp_path / "four"
    (one / "documents.parquet").parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, str(one / "documents.parquet"))
    d = four / "documents.parquet"
    d.mkdir(parents=True)
    n = tbl.num_rows
    for i in range(4):
        pq.write_table(
            tbl.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4),
            str(d / f"part-{i}.parquet"),
        )
    a = dedup.ngram_jaccard_pairs(str(one), threshold=0.5)
    b = dedup.ngram_jaccard_pairs(str(four), threshold=0.5)
    assert a.to_dict("records") == b.to_dict("records")


# --- connected components (hash-to-min) --------------------------------------


def _brute_components(pairs):
    import itertools

    lab = {}
    for a, b in pairs:
        lab.setdefault(a, a)
        lab.setdefault(b, b)
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            m = min(lab[a], lab[b])
            if lab[a] != m or lab[b] != m:
                lab[a] = lab[b] = m
                changed = True
    return sorted(lab.items())


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (10, 11)],                      # two comps
        [(5, 1), (5, 2), (5, 3), (5, 4)],                # star, rep=1
        [(i, i + 1) for i in range(64)],                 # 65-node path
        [(2, 1), (4, 3), (1, 4), (100, 7)],              # merge order
    ],
)
def test_connected_components_matches_bruteforce(ray_session, pairs):
    import pandas as pd

    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    got = dedup.connected_components(df)
    assert list(map(tuple, got.to_numpy())) == _brute_components(pairs)


def test_connected_components_empty(ray_session):
    import pandas as pd

    got = dedup.connected_components(pd.DataFrame(columns=["doc_a", "doc_b"]))
    assert got.empty and list(got.columns) == ["doc_id", "rep_id"]


def test_neardup_components_groups_planted(ray_session, tmp_path):
    """Planted corpus: docs {0,100,101} are one component (0/100 and
    0/101 are near-dups; 100/101 connect THROUGH 0 even though their
    direct J may sit under threshold) and {1,200} another."""
    import pyarrow.parquet as pq

    pq.write_table(_planted_corpus(), str(tmp_path / "documents.parquet"))
    got = dedup.neardup_components(str(tmp_path), threshold=0.9)
    rep = dict(map(tuple, got.to_numpy()))
    assert rep[0] == rep[100] == rep[101] == 0
    assert rep[1] == rep[200] == 1


def test_pairs_dataset_parquet_roundtrip(ray_session, tmp_path):
    """The 100-TB path: verified pairs as a Dataset → parquet sink →
    components fed from the files — same answer as the collected chain,
    with no pair DataFrame on the driver in between."""
    import pyarrow.parquet as pq

    pq.write_table(_planted_corpus(), str(tmp_path / "documents.parquet"))
    pairs_dir = str(tmp_path / "pairs_out")
    dedup.ngram_jaccard_pairs_ds(str(tmp_path), threshold=0.9).write_parquet(
        pairs_dir
    )
    ref_pairs = dedup.ngram_jaccard_pairs(str(tmp_path), threshold=0.9)
    from_files = (
        ray.data.read_parquet(pairs_dir)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)[["doc_a", "doc_b", "jaccard"]]
    )
    assert from_files.equals(ref_pairs)
    comps = dedup.connected_components(ray.data.read_parquet(pairs_dir))
    ref = dedup.connected_components(ref_pairs)
    assert comps.equals(ref)


def test_minhash_simhash_ds_paths_match_collected(ray_session, tmp_path):
    """Dataset variants of the LSH chains return the collected answers."""
    import pyarrow.parquet as pq

    pq.write_table(_planted_corpus(), str(tmp_path / "documents.parquet"))
    mh_ds = (
        dedup.minhash_dedup_pairs_ds(str(tmp_path), threshold=0.5)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    mh = dedup.minhash_dedup_pairs(str(tmp_path), threshold=0.5)
    assert mh_ds[["doc_a", "doc_b", "jaccard"]].equals(mh)
    assert len(mh) >= 1
    sh_ds = (
        dedup.simhash_dedup_pairs_ds(str(tmp_path), max_hamming=10)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    sh = dedup.simhash_dedup_pairs(str(tmp_path), max_hamming=10)
    assert sh_ds[["doc_a", "doc_b", "hamming"]].equals(sh)


# --- substring-level duplication (kgram_dup_stats) ---------------------------


def test_window_hashes_never_straddle_docs():
    from torchtrajectory_ray.pipelines.dedup import _window_hashes

    # doc0's tail + doc1's head would form a window iff boundaries leaked
    h, local = _window_hashes(["a b c d", "e f g h"], k=4)
    assert local.tolist() == [0, 1] and h[0] != h[1]
    # identical docs yield identical window hashes
    h2, _ = _window_hashes(["a b c d", "a b c d"], k=4)
    assert h2[0] == h2[1]
    # shorter-than-k docs contribute nothing
    h3, l3 = _window_hashes(["a b", "a b c d e"], k=4)
    assert l3.tolist() == [1, 1]


def test_kgram_dup_stats_matches_bruteforce(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines.dedup import kgram_dup_stats

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 40)))
        for _ in range(120)
    ]
    texts += texts[:10]          # full copies: every window duplicated
    texts += ["w1 w2"]           # shorter than k: no windows
    d = tmp_path / "kg"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    k = 8
    got = (
        kgram_dup_stats(str(d), k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force
    from collections import Counter

    grams: Counter = Counter()
    per_doc: list[list[str]] = []
    for t in texts:
        toks = t.split(" ")
        gs = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        per_doc.append(gs)
        grams.update(gs)
    exp_rows = [
        (i, len(gs), sum(1 for g in gs if grams[g] >= 2))
        for i, gs in enumerate(per_doc)
        if gs
    ]
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "n_windows", "n_dup"])
    pd.testing.assert_frame_equal(got, exp.astype("int64"))
    # the planted full copies are fully duplicated
    copies = got[got["doc_id"] >= 120]
    assert (copies["n_dup"] == copies["n_windows"]).all()


def test_kgram_dup_stats_broadcast_bound_fails_loud(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines.dedup import kgram_dup_stats

    texts = ["x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"] * 4  # every gram duplicated
    d = tmp_path / "kg2"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    with pytest.raises(ValueError, match="broadcast bound"):
        kgram_dup_stats(str(d), k=8, max_dup_hashes=1)


def test_components_local_matches_distributed(ray_session, monkeypatch):
    """The single-task union-find fast path produces the identical
    (doc_id, rep_id) labels as the hash-to-min exchange rounds."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(17)
    # several chains + stars + singletons-by-absence
    pairs = []
    base = 0
    for size in (2, 3, 5, 9, 17):
        ids = base + rng.permutation(size) * 7
        pairs += [(int(min(a, b)), int(max(a, b))) for a, b in zip(ids, ids[1:])]
        base += 1000
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    local = dedup.connected_components(df)
    monkeypatch.setattr(dedup, "LOCAL_CC_MAX_ROWS", 0)
    dist = dedup.connected_components(df)
    pd.testing.assert_frame_equal(local, dist)
    # rep is the component minimum
    assert (local.groupby("rep_id")["doc_id"].min().to_numpy()
            == local["rep_id"].unique()).all()
