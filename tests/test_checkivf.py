"""check_ivf: a clean IVF layout verifies ok=True; every planted
corruption class is caught with a pointed violation — the vector-side
mirror of test_checkindex.py's text classes."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from torchtrajectory_ray.pipelines.checkindex import check_ivf


@pytest.fixture()
def layout(ray_session, tmp_path):
    from torchtrajectory_ray.pipelines import ivf

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(6, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 50, axis=0) + 0.05 * rng.normal(size=(300, 16))
    src = str(tmp_path / "emb.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300, dtype=np.int64)),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        src,
    )
    d = str(tmp_path / "ivf")
    ivf.build_ivf([src], d, id_col="vec_id", nlist=6)
    return d


def _meta(d):
    with open(os.path.join(d, "meta.json")) as f:
        return json.load(f)


def _save(d, meta):
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)


def _first_part(d):
    meta = _meta(d)
    key = sorted(meta["buckets"], key=int)[0]
    return key, os.path.join(d, meta["buckets"][key]["paths"][0])


def test_clean_layout_passes(layout):
    rep = check_ivf(layout)
    assert rep["ok"], rep["violations"][:5]
    assert rep["n_buckets"] > 0 and rep["n_vectors"] == 300


def test_clean_layout_with_radii_and_tombstones_passes(layout):
    from torchtrajectory_ray.pipelines import ivf

    meta = _meta(layout)
    ivf._centroid_radii(layout, meta)  # materialize the sidecar
    ivf.delete_vectors(layout, [3, 7])
    rep = check_ivf(layout)
    assert rep["ok"], rep["violations"][:5]


def test_missing_part_file_caught(layout):
    _, p = _first_part(layout)
    os.remove(p)
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("missing on disk" in v for v in rep["violations"]), rep[
        "violations"
    ][:5]


def test_orphan_part_caught(layout):
    _, p = _first_part(layout)
    shutil.copy(p, os.path.join(os.path.dirname(p), "part-orphan.parquet"))
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("orphan part" in v for v in rep["violations"])


def test_row_count_lie_caught(layout):
    key, p = _first_part(layout)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, t.num_rows - 1), p)
    meta = _meta(layout)  # keep meta bytes honest so only n trips
    meta["buckets"][key]["bytes"] = os.path.getsize(p)
    meta["total_bytes"] = sum(
        int(v["bytes"]) for v in meta["buckets"].values()
    )
    _save(layout, meta)
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("!= meta n" in v for v in rep["violations"]), rep[
        "violations"
    ][:5]


def test_min_cos_lie_caught(layout):
    key, _ = _first_part(layout)
    meta = _meta(layout)
    meta["buckets"][key]["min_cos"] = 0.999999  # claims tighter than truth
    _save(layout, meta)
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("not admissible" in v for v in rep["violations"]), rep[
        "violations"
    ][:5]


def test_sq8_corruption_caught(layout):
    _, p = _first_part(layout)
    t = pq.read_table(p)
    codes = t["embedding_sq8"].to_pylist()
    codes[0] = [(c + 90) % 256 - 128 for c in codes[0]]
    t = t.set_column(
        t.column_names.index("embedding_sq8"),
        "embedding_sq8",
        pa.array(codes, pa.list_(pa.int8())),
    )
    pq.write_table(t, p)
    key = _first_part(layout)[0]
    meta = _meta(layout)
    meta["buckets"][key]["bytes"] = os.path.getsize(p)
    meta["total_bytes"] = sum(
        int(v["bytes"]) for v in meta["buckets"].values()
    )
    _save(layout, meta)
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("sq8 dequantization" in v for v in rep["violations"]), rep[
        "violations"
    ][:5]


def test_duplicate_id_caught(layout):
    _, p = _first_part(layout)
    t = pq.read_table(p)
    dup = pa.concat_tables([t, t.slice(0, 1)])
    pq.write_table(dup, p)
    key = _first_part(layout)[0]
    meta = _meta(layout)
    meta["buckets"][key]["n"] += 1
    meta["n_vectors"] += 1
    meta["buckets"][key]["bytes"] = os.path.getsize(p)
    meta["total_bytes"] = sum(
        int(v["bytes"]) for v in meta["buckets"].values()
    )
    _save(layout, meta)
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("more than one layout row" in v for v in rep["violations"]), (
        rep["violations"][:5]
    )


def test_radii_lie_caught(layout):
    import hashlib

    from torchtrajectory_ray.pipelines import ivf

    meta = _meta(layout)
    radii = ivf._centroid_radii(layout, meta)
    fp = hashlib.md5(
        json.dumps(meta, sort_keys=True).encode()
    ).hexdigest()[:10]
    with open(os.path.join(layout, f"radii-{fp}.json"), "w") as f:
        json.dump({"radii": (radii * 0.2).tolist()}, f)
    rep = check_ivf(layout)
    assert not rep["ok"]
    assert any("inadmissible" in v for v in rep["violations"]), rep[
        "violations"
    ][:5]


def test_distributed_equals_inline(layout):
    a = check_ivf(layout, distributed=True)
    b = check_ivf(layout, distributed=False)
    assert a["ok"] == b["ok"] and a["n_vectors"] == b["n_vectors"]
    assert sorted(a["violations"]) == sorted(b["violations"])
