#!/usr/bin/env python
"""Multi-million-row soak of the behavioral-analytics batch (cohort
retention, hourly active users, event transitions, per-type z-score)
and the Bloom-prefiltered semi-join — over synthetic events/orders
tables big enough that the exchanges dominate.  Every op is GATED
against a driver-side numpy/pandas ground truth, not just timed:

- cohort_retention  == pandas first-day/offset triangle
- hourly_active_users == pandas groupby(hour).nunique
- event_transitions == pandas sort+shift pair counts
- value_zscore      == per-type (v − μ)/σ on a sampled slice
- region_orders_semijoin row count + key sum == numpy isin semi-join,
  and the bloom prune factor is reported (probe survivors / probe rows)

Usage:  python jobs/soak_behavior_job.py [--n-rows 8000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = "/tmp/ttray_soak/behavior"
DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def build_tables(n_rows: int, n_files: int = 16) -> str:
    """Deterministic sharded events + customer/orders/nation/region."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(SOAK_DIR, f"n{n_rows}")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    ev_dir = os.path.join(d, "events.parquet")
    os.makedirs(ev_dir, exist_ok=True)
    per = n_rows // n_files
    types = np.array(["view", "click", "purchase", "signup", "error"])
    n_users = max(1000, n_rows // 80)
    for i in range(n_files):
        rng = np.random.default_rng(777 + i)
        n = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        base = i * per
        ts_us = rng.integers(0, 30 * DAY_US, size=n)
        df = pd.DataFrame(
            {
                "event_id": np.arange(base, base + n, dtype=np.int64),
                "ts": pd.to_datetime(ts_us, unit="us").astype("datetime64[us]"),
                "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
                "event_type": types[rng.integers(0, 5, size=n)],
                "value": np.round(rng.lognormal(3.0, 1.0, size=n), 3),
                "props": "{}",
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(ev_dir, f"part-{i:04d}.parquet"),
        )
    # orders/customer/nation/region for the semi-join (orders = n_rows)
    n_cust = max(10_000, n_rows // 8)
    rng = np.random.default_rng(4242)
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "c_custkey": np.arange(n_cust, dtype=np.int64),
                    "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int64),
                }
            ),
            preserve_index=False,
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "n_nationkey": np.arange(25, dtype=np.int64),
                    "n_regionkey": (np.arange(25) % 5).astype(np.int64),
                }
            ),
            preserve_index=False,
        ),
        os.path.join(d, "nation.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "r_regionkey": np.arange(5, dtype=np.int64),
                    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                }
            ),
            preserve_index=False,
        ),
        os.path.join(d, "region.parquet"),
    )
    ord_dir = os.path.join(d, "orders.parquet")
    os.makedirs(ord_dir, exist_ok=True)
    for i in range(n_files):
        rng = np.random.default_rng(999 + i)
        n = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        base = i * per
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(base, base + n, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, size=n).astype(np.int64),
                "o_totalprice": np.round(rng.uniform(1, 1e5, size=n), 2),
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(ord_dir, f"part-{i:04d}.parquet"),
        )
    open(marker, "w").write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rows", type=int, default=8_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    t0 = time.monotonic()
    d = build_tables(args.n_rows)
    out: dict = {
        "n_rows": args.n_rows,
        "cpus": args.cpus,
        "gen_s": round(time.monotonic() - t0, 1),
    }

    from torchtrajectory_ray.pipelines.analytics import region_orders_semijoin
    from torchtrajectory_ray.pipelines.events import (
        cohort_retention,
        event_transitions,
        hourly_active_users,
        value_zscore,
    )

    def timed(name, fn):
        t = time.monotonic()
        r = fn()
        dt = time.monotonic() - t
        out[f"{name}_s"] = round(dt, 2)
        out[f"{name}_rows_per_s"] = int(args.n_rows / dt)
        return r

    # driver-side ground truth (soak gate only)
    ev = pq.read_table(
        os.path.join(d, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    uid = ev["user_id"].to_numpy()
    ts_us = ev["ts"].cast("int64").to_numpy()
    et = ev["event_type"].to_pandas().to_numpy()
    val = ev["value"].to_numpy()
    eid = ev["event_id"].to_numpy()

    # 1. cohort retention
    got = timed("cohort_retention", lambda: cohort_retention(d))
    day = ts_us // DAY_US
    pdf = pd.DataFrame({"u": uid, "day": day}).drop_duplicates()
    first = pdf.groupby("u")["day"].transform("min")
    want = (
        pd.DataFrame(
            {"cohort_day_us": first * DAY_US, "offset_days": pdf["day"] - first}
        )
        .groupby(["cohort_day_us", "offset_days"], as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
        .sort_values(["cohort_day_us", "offset_days"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(want.astype("int64")), "cohort mismatch"

    # 2. hourly active users
    got = timed("hourly_active_users", lambda: hourly_active_users(d))
    want = (
        pd.DataFrame({"h": (ts_us // HOUR_US) * HOUR_US, "u": uid})
        .groupby("h")["u"]
        .nunique()
    )
    assert np.array_equal(got["window_start_us"].to_numpy(), want.index.to_numpy())
    assert np.array_equal(got["n_users"].to_numpy(), want.to_numpy())

    # 3. event transitions
    got = timed("event_transitions", lambda: event_transitions(d))
    order = np.lexsort((eid, ts_us, uid))
    su, se = uid[order], et[order]
    same = su[1:] == su[:-1]
    want = (
        pd.DataFrame({"prev_type": se[:-1][same], "next_type": se[1:][same]})
        .groupby(["prev_type", "next_type"], as_index=False)
        .size()
        .rename(columns={"size": "n_transitions"})
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    assert got.equals(want.astype({"n_transitions": "int64"})), "transitions"

    # 4. per-type z-score (gate on a 10k sample against pandas stats)
    zds = timed("value_zscore", lambda: value_zscore(d).materialize())
    sample = zds.limit(10_000).to_pandas().set_index("event_id")
    s = pd.DataFrame({"event_type": et, "value": val}, index=eid)
    stats = s.groupby("event_type")["value"].agg(["mean", "std"])
    sl = s.loc[sample.index]
    want_z = (
        (sl["value"] - sl["event_type"].map(stats["mean"]).to_numpy())
        / sl["event_type"].map(stats["std"]).to_numpy()
    ).round(6)
    assert np.allclose(sample["zscore"].to_numpy(), want_z.to_numpy(), atol=2e-6)

    # 5. bloom semi-join (count + key-sum gate, prune-factor report)
    got = timed(
        "region_orders_semijoin",
        lambda: region_orders_semijoin(d, region="ASIA").to_pandas(),
    )
    cust = pq.read_table(os.path.join(d, "customer.parquet")).to_pandas()
    nat = pq.read_table(os.path.join(d, "nation.parquet")).to_pandas()
    asia_n = set(nat[nat["n_regionkey"] == 2]["n_nationkey"])
    keys = cust[cust["c_nationkey"].isin(asia_n)]["c_custkey"].to_numpy()
    ordk = pq.read_table(
        os.path.join(d, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    m = np.isin(ordk["o_custkey"].to_numpy(), keys)
    assert len(got) == int(m.sum()), (len(got), int(m.sum()))
    assert got["o_orderkey"].sum() == int(
        ordk["o_orderkey"].to_numpy()[m].sum()
    )
    out["semijoin_selectivity"] = round(float(m.mean()), 4)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
