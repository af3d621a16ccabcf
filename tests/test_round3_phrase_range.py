"""Round-3 engine features: distributed phrase verification, the
candidate cap, and the distributed find_in_range bulk variant."""

from __future__ import annotations

import numpy as np
import pytest

from torchtrajectory_ray.pipelines import corpus

SF = "/root/testdata/sf0.001"


def test_phrase_distributed_path_equals_driver_path(ray_session):
    """Forcing every verification through the chunked map_batches path
    (distribute_over=0) must return exactly the driver-path answer for
    every workload phrase, including the repeated-term and trigram
    ones."""
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    for q in corpus.PHRASE_QUERIES:
        driver = eng.phrase_and(q["phrase"], distribute_over=10**9)
        dist = eng.phrase_and(q["phrase"], distribute_over=0)
        assert driver.tolist() == dist.tolist(), q


def test_phrase_match_pipeline_both_paths_agree(ray_session):
    auto = corpus.phrase_match(SF)
    forced = corpus.phrase_match(SF, distribute_over=0)
    assert auto.values.tolist() == forced.values.tolist()
    assert len(auto) > 0


def test_phrase_candidate_cap_fails_loud(ray_session):
    """A stopword phrase whose AND set exceeds max_candidates must raise
    with guidance, not grind a corpus-sized verification."""
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    with pytest.raises(ValueError, match="max_candidates"):
        eng.phrase_and(["the", "a"], max_candidates=5)
    # same phrase under a sane cap still answers
    assert isinstance(eng.phrase_and(["the", "a"]), np.ndarray)


def test_find_in_range_ds_matches_serving_path(ray_session):
    """The Dataset-returning bulk variant must equal the driver-side
    pyarrow scan for every predicate combination."""
    from torchtrajectory_ray.pipelines.corpus import _engine, documents_index

    eng = _engine(documents_index(SF))
    cases = [
        dict(lang="en", doclen_lo=40, doclen_hi=90),
        dict(doclen_hi=30),
        dict(lang="de"),
        dict(),
    ]
    for kw in cases:
        serving = eng.find_in_range(**kw)
        bulk = (
            eng.find_in_range_ds(**kw)
            .to_pandas()["doc_id"]
            .sort_values()
            .to_numpy()
        )
        assert serving.tolist() == bulk.tolist(), kw


def test_find_in_range_ds_timestamp_predicate(ray_session, tmp_path):
    """The sf documents table carries no warc_ts (all-null column), so
    the ts predicate is exercised on a fixture corpus that has one."""
    from torchtrajectory_ray import fixtures
    from torchtrajectory_ray.config import IndexConfig
    from torchtrajectory_ray.pipelines.build import build_index
    from torchtrajectory_ray.state.engine import QueryEngine

    paths = fixtures.write_webpages(str(tmp_path / "docs"), 300, num_files=3)
    idx = str(tmp_path / "idx")
    build_index(paths, idx, IndexConfig(num_term_shards=2, num_salts=2))
    eng = QueryEngine(idx)
    all_ids = eng.find_in_range()
    import pyarrow.dataset as pads

    t = pads.dataset(eng.docs_paths, format="parquet").to_table(
        columns=["warc_ts"]
    )
    ts = t["warc_ts"].cast("int64").drop_null().to_numpy(zero_copy_only=False)
    assert ts.size > 0
    mid = int(np.median(ts))
    serving = eng.find_in_range(ts_lo=mid)
    bulk = (
        eng.find_in_range_ds(ts_lo=mid).to_pandas()["doc_id"].sort_values()
    )
    assert 0 < serving.size < all_ids.size
    assert serving.tolist() == bulk.tolist()


def test_write_clean_corpus_threshold_agrees_with_clean_corpus(
    ray_session, tmp_path
):
    """Both cleaning entry points must apply the SAME near-dup threshold
    (r2 advice: write_clean_corpus had it hard-coded at 0.7)."""
    from torchtrajectory_ray.pipelines import clean

    thr = 0.2  # permissive → some near-dups fire at sf0.001
    v = clean.clean_corpus(SF, near_dup_threshold=thr)
    n_near = int((v["reason"] == "near_dup").sum())
    res = clean.write_clean_corpus(
        SF, str(tmp_path / "out"), near_dup_threshold=thr
    )
    assert res["counts"].get("near_dup", 0) == n_near
    assert res["counts"].get("kept", 0) == int((v["reason"] == "kept").sum())


def test_soak_corpus_ids_unique_with_uneven_shards(ray_session, tmp_path):
    """The soak generator's last shard is shorter when n_docs doesn't
    divide evenly; its doc_id base must still be the GLOBAL offset
    (round-3 review finding: base derived from the truncated count
    overlapped the previous shard)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "soak_clean_job",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "jobs",
            "soak_clean_job.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.SOAK_ROOT = str(tmp_path)  # keep scratch local to the test
    soak_dir = mod.build_corpus(1000, n_shards=7)  # 1000 % ceil(1000/7) != 0
    import pyarrow.dataset as pads

    ids = (
        pads.dataset(
            os.path.join(soak_dir, "documents.parquet"), format="parquet"
        )
        .to_table(columns=["doc_id"])["doc_id"]
        .to_numpy()
    )
    assert len(ids) == 1000
    assert len(np.unique(ids)) == 1000
    assert ids.min() == 0 and ids.max() == 999


def test_semantic_rerank(ray_session):
    """Hybrid BM25→embedding rerank: results are a subset of the BM25
    candidate set, ordered by (sim desc, doc_id asc), deterministic."""
    from torchtrajectory_ray.pipelines import semantic
    from torchtrajectory_ray.pipelines.corpus import (
        WEB_QUERIES,
        _engine,
        documents_index,
    )

    out = semantic.semantic_rerank(SF, k=5, candidates=30)
    assert list(out.columns) == ["query_id", "rank", "doc_id", "sim", "bm25_score"]
    assert len(out) > 0
    eng = _engine(documents_index(SF))
    for q in WEB_QUERIES:
        g = out[out.query_id == q["query_id"]].sort_values("rank")
        if len(g) == 0:
            continue
        cand = {d for d, _ in eng.topk(q["terms"], k=30)}
        assert set(g["doc_id"]) <= cand
        sims = g["sim"].to_numpy()
        assert (np.diff(sims) <= 1e-12).all()  # sim non-increasing
        # ties broken by doc_id asc
        for i in range(len(g) - 1):
            if sims[i] == sims[i + 1]:
                assert g["doc_id"].iloc[i] < g["doc_id"].iloc[i + 1]
    assert out.equals(semantic.semantic_rerank(SF, k=5, candidates=30))


def test_semantic_rerank_sims_are_token_hashed_cosines(ray_session):
    """The reported sim must equal the cosine between the TOKEN-hashed
    query vector and the candidate's staged doc vector (a joined-string
    query would hash characters and score garbage — review finding)."""
    from torchtrajectory_ray.pipelines import semantic
    from torchtrajectory_ray.pipelines.corpus import WEB_QUERIES
    from torchtrajectory_ray.pipelines.embed import (
        DocEmbedder,
        _staged_doc_embeddings,
    )

    out = semantic.semantic_rerank(SF, k=3, candidates=10)
    emb = DocEmbedder()
    paths = _staged_doc_embeddings(SF, emb.dim)
    vecs = semantic._candidate_vectors(
        paths, out["doc_id"].to_numpy().astype(np.int64)
    )
    by_qid = {q["query_id"]: q["terms"] for q in WEB_QUERIES}
    checked = 0
    for _, row in out.head(20).iterrows():
        qv = emb.vectors([list(by_qid[row["query_id"]])])[0]
        expect = round(float(vecs[int(row["doc_id"])] @ qv), 6)
        assert abs(row["sim"] - expect) <= 1e-6, (row.to_dict(), expect)
        checked += 1
    assert checked > 0
    # token-hashed query vectors are NOT the char-bag of the joined
    # string (the exact defect this guards against)
    terms = ["spark", "join"]
    good = emb.vectors([terms])[0]
    chars = emb.vectors([list(" ".join(terms))])[0]
    assert float(good @ chars) < 0.9


def test_semantic_rerank_ds_matches_driver_form(ray_session):
    """The actor-pool + groupby distributed rerank must be
    rank-identical to the driver form."""
    from torchtrajectory_ray.pipelines import semantic

    drv = semantic.semantic_rerank(SF, k=5, candidates=20)
    ds = (
        semantic.semantic_rerank_ds(SF, k=5, candidates=20)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    drv = drv.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert drv[["query_id", "rank", "doc_id"]].equals(
        ds[["query_id", "rank", "doc_id"]]
    )
    assert np.allclose(drv["sim"], ds["sim"], atol=1e-6)
