"""Gates for the KMV bottom-k quantile sketch (functions/kmv.py +
events.value_quantiles): parallelism/batch-boundary independence,
exactness at k >= n, the rank bound on adversarial (tie-heavy)
distributions, and injectivity of the sample key.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from torchtrajectory_ray.functions.kmv import bottom_k, mix64, quantile_disc
from torchtrajectory_ray.pipelines.events import (
    value_quantiles,
    value_quantiles_check,
)


def _write_events_dir(tmp_path, event_ids, values, num_files):
    d = tmp_path / "events.parquet"
    d.mkdir(parents=True)
    n = len(event_ids)
    df = pd.DataFrame(
        {
            "event_id": np.asarray(event_ids, np.int64),
            "ts": pd.to_datetime(np.zeros(n), unit="us"),
            "user_id": np.zeros(n, np.int64),
            "event_type": "click",
            "value": np.asarray(values, np.float64),
            "props": "{}",
        }
    )
    for i in range(num_files):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i::num_files], preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    return str(tmp_path)


def test_mix64_injective_and_deterministic():
    ids = np.arange(200_000, dtype=np.int64)
    h = mix64(ids)
    assert len(np.unique(h)) == len(ids)  # bijection: no collisions
    assert (h == mix64(ids)).all()


def test_estimate_independent_of_file_layout(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    n = 20_000
    vals = rng.lognormal(0.0, 1.5, n)
    outs = []
    for i, nf in enumerate([1, 7]):
        sf = _write_events_dir(
            tmp_path / f"l{i}", np.arange(n), vals, num_files=nf
        )
        outs.append(value_quantiles(sf, k=512))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bit-identical


def test_exact_when_k_covers_n(ray_session, tmp_path):
    rng = np.random.default_rng(4)
    n = 3_000
    vals = np.round(rng.uniform(0, 1000, n), 6)
    sf = _write_events_dir(tmp_path, np.arange(n), vals, num_files=4)
    got = value_quantiles(sf, k=n)
    exp = duckdb.sql(
        "SELECT quantile_disc(v, [x/10.0 for x in range(1, 10)]) "
        "FROM (SELECT unnest(?::DOUBLE[]) AS v)",
        params=[list(vals)],
    ).fetchone()[0]
    assert got["est"].tolist() == list(exp)


def test_bound_holds_under_heavy_ties(ray_session, tmp_path):
    # half the mass on one value: the CDF jumps across several quantiles
    # — the two-sided bracket must still certify the estimates
    rng = np.random.default_rng(5)
    n = 30_000
    vals = np.where(rng.random(n) < 0.5, 42.0, rng.uniform(100, 200, n))
    sf = _write_events_dir(tmp_path, np.arange(n), vals, num_files=5)
    chk = value_quantiles_check(sf, k=1024)
    assert (chk["within_bound"] == 1).all()
    assert (chk["n_rows"] == n).all()
    # the tied value is itself the estimate for the low quantiles
    est = value_quantiles(sf, k=1024)
    assert (est["est"].to_numpy()[:4] == 42.0).all()


def test_bottom_k_and_quantile_disc_kernels():
    h = np.array([9, 1, 7, 3, 5], np.uint64)
    v = np.arange(5.0) * 10
    hh, vv = bottom_k(h, v, 2)
    assert sorted(hh.tolist()) == [1, 3] and sorted(vv.tolist()) == [10.0, 30.0]
    # quantile_disc convention: sorted element at ceil(p*m) - 1
    s = np.array([1.0, 2.0, 3.0, 4.0])
    assert quantile_disc(s, [0.25, 0.5, 0.75, 1.0]).tolist() == [
        1.0, 2.0, 3.0, 4.0,
    ]


def test_by_type_matches_per_group_single_runs(ray_session, tmp_path):
    # the grouped sketch must equal running the ungrouped sketch on each
    # group's rows alone (same hashes, same sample, same estimates)
    from torchtrajectory_ray.pipelines.events import value_quantiles_by_type

    rng = np.random.default_rng(6)
    n = 12_000
    types = rng.choice(["a", "b", "c"], n)
    vals = np.round(rng.exponential(50.0, n), 6)
    d = tmp_path / "events.parquet"
    d.mkdir(parents=True)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.zeros(n), unit="us"),
            "user_id": np.zeros(n, np.int64),
            "event_type": types,
            "value": vals,
            "props": "{}",
        }
    )
    for i in range(6):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i::6], preserve_index=False),
            str(d / f"part-{i}.parquet"),
        )
    got = value_quantiles_by_type(str(tmp_path), k=256)
    from torchtrajectory_ray.functions.kmv import bottom_k, mix64, quantile_disc

    for t in ["a", "b", "c"]:
        m = types == t
        h, v = bottom_k(mix64(np.arange(n)[m]), vals[m], 256)
        exp = quantile_disc(v, [p / 10 for p in range(1, 10)])
        assert got.loc[got.event_type == t, "est"].tolist() == exp.tolist()
