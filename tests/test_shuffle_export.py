"""Seeded deterministic global shuffle (the training-export ordering):
pure function of (doc ids, seed), independent of read parallelism, and
different per seed.  The row-for-row ordering itself is driver-gated
against DuckDB (queries()[shuffled_ids])."""

from __future__ import annotations

from torchtrajectory_ray.pipelines import sampling

SF = "/root/testdata/sf0.001"


def test_order_is_deterministic_and_seeded(ray_session):
    a = sampling.shuffled_ids(SF, seed=42)
    b = sampling.shuffled_ids(SF, seed=42)
    c = sampling.shuffled_ids(SF, seed=7)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["doc_id"].tolist() != c["doc_id"].tolist()
    # a shuffle: not the natural order
    assert a["doc_id"].tolist() != sorted(a["doc_id"].tolist())
    # a permutation: nothing lost or duplicated
    assert sorted(a["doc_id"].tolist()) == sorted(set(a["doc_id"].tolist()))


def test_order_independent_of_parallelism(ray_session):
    import ray.data

    base = sampling.shuffled_ids(SF, seed=42)["doc_id"].tolist()
    ds = sampling.global_shuffle_ds(SF, seed=42)
    # re-express the same pipeline over a differently-sharded read
    import pyarrow as pa

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"]
    ).repartition(7)

    def add_key(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return batch.append_column(
            "shuffle_key",
            pa.array(sampling.shuffle_key(ids, 42), pa.string()),
        )

    other = (
        docs.map_batches(add_key, batch_format="pyarrow")
        .sort("shuffle_key")
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert other == base
    assert ds.count() == len(base)


def test_carries_requested_columns(ray_session):
    ds = sampling.global_shuffle_ds(SF, seed=42, columns=["lang"])
    df = ds.to_pandas()
    assert list(df.columns) == ["doc_id", "lang", "shuffle_key"]


def test_export_shuffled_is_ordered_and_resumable(ray_session, tmp_path):
    """Concatenating the export shards in shard order reproduces the
    global shuffle order exactly; a re-run skips every finished shard;
    deleting one shard re-writes ONLY that shard."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    out = str(tmp_path / "export")
    m = sampling.export_shuffled(SF, out, seed=42, n_shards=8)
    assert m["skipped"] == 0 and len(m["shards"]) == 8
    got = pd.concat(
        [pq.read_table(os.path.join(out, s)).to_pandas() for s in m["shards"]]
    )
    want = sampling.shuffled_ids(SF, seed=42)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert "text" in got.columns
    # resume: everything skips
    m2 = sampling.export_shuffled(SF, out, seed=42, n_shards=8)
    assert m2["skipped"] == len(m2["shards"])
    # partial resume: only the deleted shard re-writes
    victim = m["shards"][0]
    os.remove(os.path.join(out, victim))
    os.remove(os.path.join(out, victim + ".ok"))
    m3 = sampling.export_shuffled(SF, out, seed=42, n_shards=8)
    assert m3["skipped"] == len(m3["shards"]) - 1
    got3 = pq.read_table(os.path.join(out, victim)).to_pandas()
    assert got3["doc_id"].tolist() == pd.concat(
        [pq.read_table(os.path.join(out, s)).to_pandas() for s in m["shards"]]
    ).iloc[: len(got3)]["doc_id"].tolist()


def test_shard_assignment_monotone_in_key(ray_session):
    keys = sorted(sampling.shuffle_key(__import__("numpy").arange(500), 42))
    sh = sampling.shuffle_shard_of(keys, 16)
    assert (sh[1:] >= sh[:-1]).all()


def test_export_writes_empty_shards_explicitly(ray_session, tmp_path):
    """A shard whose key range matches zero rows still gets a
    schema-correct empty parquet + .ok and the manifest names it in
    empty_shards — consumers can distinguish expected-empty from
    missing/failed."""
    import os

    import pyarrow.parquet as pq

    out = str(tmp_path / "export_sparse")
    # far more shards than docs -> most shards MUST be empty
    m = sampling.export_shuffled(SF, out, seed=42, n_shards=2048)
    assert len(m["shards"]) == 2048
    assert len(m["empty_shards"]) > 0
    s = m["empty_shards"][0]
    p = os.path.join(out, f"shard-{s:05d}.parquet")
    assert os.path.exists(p) and os.path.exists(p + ".ok")
    t = pq.read_table(p)
    assert t.num_rows == 0
    assert set(m["columns"] + ["shuffle_key"]) == set(t.schema.names)
