"""Similarity search + analytics operators against driver testdata
(sf0.001) and numpy/duckdb references."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from torchtrajectory_ray.pipelines import analytics, knn

SF = "/root/testdata/sf0.001"


def _brute_reference(k=10):
    """Numpy single-process cosine top-k reference."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    e = np.asarray([v for v in t["embedding"].to_pylist()], dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    q = e[[list(ids).index(v) for v in knn.QUERY_VEC_IDS]]
    sims = (q @ e.T) / (
        np.linalg.norm(q, axis=1, keepdims=True) * np.linalg.norm(e, axis=1)
    )
    out = {}
    for qi, qid in enumerate(knn.QUERY_VEC_IDS):
        s = np.round(sims[qi], 6)
        order = np.lexsort((ids, -s))[:k]
        out[qid] = [(int(ids[i]), float(s[i])) for i in order]
    return out


def test_knn_bruteforce_matches_numpy(ray_session):
    got = knn.knn_bruteforce(SF)
    ref = _brute_reference()
    for qid, rows in got.groupby("query_id"):
        expect = ref[qid]
        assert list(rows["neighbor_id"]) == [d for d, _ in expect]
        assert np.allclose(rows["sim"].to_numpy(), [s for _, s in expect], atol=1e-6)


def test_knn_ivf_full_probe_is_exact(ray_session):
    """nprobe == nlist ⇒ IVF degenerates to brute force (rank identity)."""
    exact = knn.knn_bruteforce(SF)
    ivf = knn.knn_ivf(SF, nlist=8, nprobe=8)
    assert exact[["query_id", "rank", "neighbor_id"]].equals(
        ivf[["query_id", "rank", "neighbor_id"]]
    )


def test_knn_ivf_recall(ray_session):
    """Approximate probe keeps high recall@10 on the clustered corpus."""
    exact = knn.knn_bruteforce(SF)
    ivf = knn.knn_ivf(SF, nlist=16, nprobe=4)
    recalls = []
    for qid in knn.QUERY_VEC_IDS:
        a = set(exact[exact.query_id == qid]["neighbor_id"])
        b = set(ivf[ivf.query_id == qid]["neighbor_id"])
        recalls.append(len(a & b) / len(a))
    assert np.mean(recalls) >= 0.5, recalls


def test_embedding_neardup_threshold(ray_session):
    pairs = knn.embedding_neardup(SF, threshold=0.45)
    assert (pairs["sim"] >= 0.45 - 1e-9).all()
    assert (pairs["vec_a"] < pairs["vec_b"]).all()


def test_knn_ivf_probe_prunes_io(ray_session):
    """The scale claim itself: a partial probe must READ strictly fewer
    bytes than the layout holds, bounded by the probed buckets' share."""
    stats = knn.knn_ivf_stats(SF, nlist=16, nprobe=2)
    assert stats["total_bytes"] > 0
    assert stats["bytes_read"] < stats["total_bytes"]
    # 8 queries × 2 probes can touch at most 16 distinct buckets, but the
    # clustered query set concentrates: require a real reduction
    assert stats["bytes_read"] <= 0.75 * stats["total_bytes"], stats
    full = knn.knn_ivf_stats(SF, nlist=16, nprobe=16)
    assert full["bytes_read"] == full["total_bytes"]


def test_embedding_neardup_exact_vs_bruteforce(ray_session):
    """Bucket-pair near-dup must return EXACTLY the brute-force pair set
    (the triangle-inequality prune may lose nothing)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    e = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    en = e / np.linalg.norm(e, axis=1, keepdims=True)
    sims = en @ en.T
    iu, ju = np.triu_indices(len(ids), k=1)
    for thr in (0.45, 0.8):
        m = sims[iu, ju] >= thr
        exp = sorted(
            (min(int(ids[a]), int(ids[b])), max(int(ids[a]), int(ids[b])))
            for a, b in zip(iu[m], ju[m])
        )
        got = knn.embedding_neardup(SF, threshold=thr)
        assert sorted(map(tuple, got[["vec_a", "vec_b"]].to_numpy())) == exp, thr


def test_neardup_bucket_pair_pruning_fires_on_clustered_data(
    ray_session, tmp_path
):
    """On TIGHTLY clustered vectors (what real near-dup corpora look
    like — duplicates concentrate) the sphere triangle inequality must
    prune most of the bucket-pair grid while staying exact.  (The sf
    embeddings table is near-uniform on the sphere — radii ~80° — where
    no partitioning can prune exact all-pairs; that's a data property,
    hence this dedicated fixture.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import ivf

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 40, axis=0) + 0.05 * rng.normal(size=(320, 32))
    ids = np.arange(320, dtype=np.int64)
    src = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        src,
    )
    d = str(tmp_path / "ivf")
    ivf.build_ivf([src], d, id_col="vec_id", nlist=8)
    got, stats = ivf.neardup_pairs(d, 0.9)
    assert stats["n_pruned"] > stats["n_bucket_pairs"] // 2, stats
    # exactness under pruning
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    e32 = np.stack([np.asarray(v, np.float32) for v in vecs]).astype(np.float64)
    e32 /= np.linalg.norm(e32, axis=1, keepdims=True)
    sims = e32 @ e32.T
    iu, ju = np.triu_indices(len(ids), k=1)
    m = sims[iu, ju] >= 0.9
    exp = sorted((int(a), int(b)) for a, b in zip(iu[m], ju[m]))
    assert sorted(map(tuple, got[["vec_a", "vec_b"]].to_numpy())) == exp


@pytest.mark.parametrize(
    "fn,sql",
    [
        (
            analytics.pricing_summary,
            """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) sum_qty,
               count(*)::BIGINT count_order
               FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
        ),
    ],
)
def test_pricing_summary_vs_duckdb(ray_session, fn, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    got = fn(SF).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    ref = con.execute(sql).fetchdf()
    assert list(got["sum_qty"]) == list(ref["sum_qty"])
    assert list(got["count_order"]) == list(ref["count_order"])


def test_revenue_topk_ordered(ray_session):
    audit = {}
    df = analytics.revenue_topk(SF, _audit=audit)
    assert list(df["rank"]) == list(range(1, len(df) + 1))
    assert (df["revenue"].diff().dropna() <= 1e-9).all()  # descending
    # the driver must only ever hold block-local top-k candidates, not
    # the full per-order revenue table (~n_orders/segments rows at sf)
    import pyarrow.parquet as pq

    n_orders = pq.read_metadata(f"{SF}/orders.parquet").num_rows
    assert audit["n_candidate_rows"] < max(n_orders // 4, 4 * audit["k"])


def test_revenue_topk_matches_undistributed(ray_session):
    """The per-block partial top-k must be lossless: same answer as the
    plain per-order aggregate computed in one process."""
    import duckdb as ddb

    con = ddb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    ref = con.execute(
        """
        WITH rev AS (
          SELECT l.l_orderkey,
                 round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          WHERE c.c_mktsegment = 'BUILDING'
          GROUP BY l.l_orderkey)
        SELECT l_orderkey, revenue FROM rev
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """
    ).fetchdf()
    got = analytics.revenue_topk(SF)
    assert list(got["l_orderkey"]) == list(ref["l_orderkey"])
    assert [round(v, 6) for v in got["revenue"]] == [
        round(v, 6) for v in ref["revenue"]
    ]


def test_nation_customer_stats_join(ray_session):
    df = analytics.nation_customer_stats(SF)
    assert df["n_customers"].sum() > 0
    assert df["n_name"].is_unique
    assert set(df.columns) == {"n_name", "r_name", "n_customers", "sum_acctbal"}


def test_kmeans_converges(ray_session):
    """Lloyd iterations must monotonically reduce inertia and beat the
    random-init assignment substantially.  (The synthetic embeddings'
    ``label`` column is not geometrically separable — max pairwise cosine
    is ~0.5 — so label recovery is not a valid check here.)"""
    from torchtrajectory_ray.pipelines.clustering import kmeans_embeddings

    assigns, centroids, history = kmeans_embeddings(SF, k=8)
    assert len(assigns) == 500
    assert assigns["cluster"].nunique() <= 8
    # non-increasing inertia, and real improvement over the first pass
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:]))
    assert history[-1] < history[0] * 0.95


def test_kmeans_deterministic(ray_session):
    from torchtrajectory_ray.pipelines.clustering import kmeans_embeddings

    a1, c1, h1 = kmeans_embeddings(SF, k=4, iters=5)
    a2, c2, h2 = kmeans_embeddings(SF, k=4, iters=5)
    assert a1.equals(a2) and np.allclose(c1, c2) and h1 == h2


def test_doc_embeddings_deterministic_and_dup_detecting(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import embed

    texts = ["alpha beta gamma " * 10, "alpha beta gamma " * 10,
             " ".join(f"q{i}" for i in range(50))]
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(texts, pa.string())})
    d = tmp_path / "sf"; d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    v1 = embed.doc_embeddings(str(d)).to_pandas()
    v2 = embed.doc_embeddings(str(d)).to_pandas()
    a = np.stack(v1["embedding"].to_numpy())
    assert np.allclose(a, np.stack(v2["embedding"].to_numpy()))  # deterministic
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)           # normalized
    pairs = embed.doc_embedding_neardup(str(d), threshold=0.99)
    assert (1, 2) in set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (1, 3) not in set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))


def test_model_actor_embeddings_identity_and_load_once(ray_session, tmp_path):
    """The actor-pool model stage (ModelDocEmbedder — the ST1
    constructor-state shape) produces vectors IDENTICAL to the inline
    function path, and the model file is loaded once PER ACTOR, not per
    batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import embed

    rng = np.random.default_rng(21)
    n = 2000  # many batches at batch_size=256 so reuse is observable
    texts = [
        " ".join(f"t{rng.integers(0, 300)}" for _ in range(25))
        for _ in range(n)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))
    model = str(tmp_path / "model.npz")
    embed.export_dummy_model(model, dim_in=embed.DIM, dim_out=24)
    log = str(tmp_path / "loads.log")

    got = (
        embed.doc_embeddings_model(
            str(d), model_path=model, concurrency=2, load_log=log
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # inline function path: same hashed vectors, same projection
    w = embed.ModelDocEmbedder._load(model)
    h = embed.DocEmbedder().vectors([t.split(" ") for t in texts])
    want = h @ w
    norms = np.linalg.norm(want, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    want = (want / norms).astype(np.float32)
    a = np.stack(got["embedding"].to_numpy())
    assert a.shape == (n, 24)
    assert np.allclose(a, want, atol=1e-6)
    # load-once-per-actor: one log line per actor in the pool, far
    # fewer than the ~8 batches the run processed
    with open(log) as f:
        loads = f.read().splitlines()
    assert 1 <= len(loads) <= 2, loads


def test_ivf_build_is_resumable_and_input_aware(ray_session, tmp_path):
    """Same inputs → second build returns the cached meta without
    rewriting files; changed inputs → stale layout is wiped and rebuilt
    (same identity discipline as the index build checkpoints)."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import ivf

    rng = np.random.default_rng(5)
    def write(n, path):
        vecs = rng.normal(size=(n, 16)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs], pa.list_(pa.float32())
                    ),
                }
            ),
            path,
        )

    src = str(tmp_path / "e.parquet")
    write(200, src)
    d = str(tmp_path / "ivf")
    m1 = ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )
    mtimes = {f: os.path.getmtime(f) for f in files}
    m2 = ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    assert m2 == m1  # cached meta, no rebuild
    assert {f: os.path.getmtime(f) for f in files} == mtimes

    # crash between parts and meta: meta missing → parts reused by
    # content address, meta rebuilt, result identical
    os.remove(os.path.join(d, "meta.json"))
    m3 = ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    # canonical centroids ⇒ identical bucket contents (file names may
    # differ if Ray batched differently; counts and radii may not)
    assert {
        b: (v["n"], round(v["min_cos"], 12)) for b, v in m3["buckets"].items()
    } == {
        b: (v["n"], round(v["min_cos"], 12)) for b, v in m1["buckets"].items()
    }

    # changed input content → stale layout wiped, counts follow new data
    _time.sleep(0.01)
    write(150, src)
    m4 = ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    assert m4["n_vectors"] == 150
    assert m4["inputs_fingerprint"] != m1["inputs_fingerprint"]


def test_ivf_sample_mod_is_part_of_layout_identity(ray_session, tmp_path):
    """Changing sample_mod must rebuild the layout (different sampling →
    different centroids), not silently serve the cached one."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import ivf

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(120, 8)).astype(np.float32)
    src = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(120, dtype=np.int64)),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        src,
    )
    d = str(tmp_path / "ivf")
    m1 = ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    m2 = ivf.build_ivf([src], d, id_col="vec_id", nlist=4, sample_mod=3)
    assert m2["params"]["sample_mod"] == 3
    assert m2["params"] != m1["params"]  # rebuilt, not cached


def test_ivf_empty_corpus(ray_session, tmp_path):
    """An empty embeddings corpus builds a valid empty layout; probe and
    near-dup answer empty instead of crashing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import ivf

    src = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        ),
        src,
    )
    d = str(tmp_path / "ivf")
    m = ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    assert m["n_vectors"] == 0 and m["buckets"] == {}
    df, st = ivf.probe_topk(d, [0], np.zeros((1, 4)), k=5, nprobe=2)
    assert len(df) == 0 and st["total_bytes"] == 0
    pr, st2 = ivf.neardup_pairs(d, 0.9)
    assert len(pr) == 0 and st2["n_bucket_pairs"] == 0


def test_neardup_quadratic_output_guard(ray_session, tmp_path):
    """An ill-posed threshold (most pairs qualify) must fail fast with
    guidance, not grind through a quadratic answer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import ivf

    rng = np.random.default_rng(2)
    base = rng.normal(size=16)
    vecs = base + 0.001 * rng.normal(size=(500, 16))  # all near-identical
    src = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(500, dtype=np.int64)),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        src,
    )
    d = str(tmp_path / "ivf")
    ivf.build_ivf([src], d, id_col="vec_id", nlist=4)
    with pytest.raises(Exception, match="max_pairs"):
        ivf.neardup_pairs(d, 0.5, max_pairs_per_task=1000)
    # a permissive cap returns the full (intended) quadratic answer
    out, _ = ivf.neardup_pairs(d, 0.5, max_pairs_per_task=10_000_000)
    assert len(out) == 500 * 499 // 2


def test_neardup_pruning_boundary_exactness(ray_session, tmp_path):
    """Clusters at controlled angular separations so SOME bucket pairs
    prune and others survive near the threshold boundary — the sharpest
    empirical check that triangle-inequality pruning never drops a
    qualifying pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import ivf

    rng = np.random.default_rng(9)
    # orthonormal-ish anchor directions, then clusters at graded angles
    # from anchor 0: 20°, 35°, 50°, 80° — with threshold cos(40°)≈0.766
    # cross-cluster pairs between the 20° and 35° clusters can qualify
    # (min angle 15°) while the 80° cluster's pairs with anchor-0 cannot
    base = np.eye(24)[:2]
    def ring(angle_deg, n, seed_vec, other):
        a = np.radians(angle_deg)
        v = np.cos(a) * seed_vec + np.sin(a) * other
        pts = v + 0.02 * rng.normal(size=(n, 24))
        return pts
    clusters = [
        ring(0, 30, base[0], base[1]),
        ring(20, 30, base[0], base[1]),
        ring(35, 30, base[0], base[1]),
        ring(50, 30, base[0], base[1]),
        ring(80, 30, base[0], base[1]),
    ]
    vecs = np.concatenate(clusters)
    ids = np.arange(len(vecs), dtype=np.int64)
    src = str(tmp_path / "e.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        src,
    )
    d = str(tmp_path / "ivf")
    ivf.build_ivf([src], d, id_col="vec_id", nlist=5)
    thr = float(np.cos(np.radians(40)))
    got, stats = ivf.neardup_pairs(d, thr)
    # partial pruning: some bucket pairs must survive AND some must prune
    assert 0 < stats["n_pruned"] < stats["n_bucket_pairs"], stats
    # exact vs brute force on the float32-stored vectors
    e32 = np.stack([np.asarray(v, np.float32) for v in vecs]).astype(np.float64)
    e32 /= np.linalg.norm(e32, axis=1, keepdims=True)
    sims = e32 @ e32.T
    iu, ju = np.triu_indices(len(ids), k=1)
    m = sims[iu, ju] >= thr
    exp = sorted((int(a), int(b)) for a, b in zip(iu[m], ju[m]))
    assert sorted(map(tuple, got[["vec_a", "vec_b"]].to_numpy())) == exp
    assert len(exp) > 1000  # the boundary case is actually exercised
