#!/usr/bin/env python
"""1M-doc soak of the cardinality / heavy-hitter operators.

Reuses soak_clean_job's deterministic sharded corpus (vocab 2000,
zipf-ish cube-law draws, all-``en``).  Gates, not just timings:

- ``distinct_terms`` (exact COUNT DISTINCT) == pyarrow brute force
- ``cardinality_hll`` within the 3-sigma HLL bound of the exact count
- ``heavy_terms`` at a TRUNCATING m (vocab 2000 > m=256, so the block
  summaries genuinely drop counters and the deficit is non-zero) must
  equal heavy_terms at m=4096 (deficit 0 ⇒ unconditionally exact)

Usage:  python jobs/soak_sketch_job.py [--n-docs 1000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    from jobs.soak_clean_job import build_corpus
    from torchtrajectory_ray.pipelines import textstats

    t0 = time.monotonic()
    soak_dir = build_corpus(args.n_docs)
    out: dict = {
        "n_docs": args.n_docs,
        "cpus": args.cpus,
        "gen_s": round(time.monotonic() - t0, 1),
    }

    def timed(name, fn):
        t = time.monotonic()
        r = fn()
        dt = time.monotonic() - t
        out[f"{name}_s"] = round(dt, 2)
        out[f"{name}_docs_per_s"] = int(args.n_docs / dt)
        return r

    exact = timed("distinct_terms", lambda: textstats.distinct_terms(soak_dir))
    n_exact = int(exact.loc[exact["lang"] == "en", "n_terms"].iloc[0])
    out["distinct_exact"] = n_exact

    est = timed("cardinality_hll", lambda: textstats.cardinality_hll(soak_dir))
    n_est = float(est.loc[est["lang"] == "en", "n_terms_est"].iloc[0])
    out["distinct_hll"] = round(n_est, 1)
    rel = abs(n_est / n_exact - 1.0)
    out["hll_rel_err"] = round(rel, 5)
    assert rel < 0.05, f"HLL estimate outside the 3-sigma bound: {rel}"

    from torchtrajectory_ray.pipelines import dedup as _dedup

    # the ~8% planted dup docs yield ~4.1M distinct duplicated grams —
    # above the conservative default broadcast bound (which correctly
    # fails loud; verified by hand), and a 33 MB int64 broadcast here
    kg = timed(
        "kgram_dup_stats",
        lambda: _dedup.kgram_dup_stats(soak_dir, max_dup_hashes=8_000_000)
        .to_pandas(),
    )
    dup_frac = float(kg["n_dup"].sum() / kg["n_windows"].sum())
    out["kgram_dup_frac"] = round(dup_frac, 4)
    # the corpus plants ~4% exact-dup docs (every window duplicated) plus
    # ~4% two-token-mutated near dups (most windows still duplicated):
    # the measured corpus-wide dup fraction must reflect them
    assert 0.04 < dup_frac < 0.6, dup_frac

    hh_exact = timed(
        "heavy_terms_m4096", lambda: textstats.heavy_terms(soak_dir, m=4096)
    )
    hh_trunc = timed(
        "heavy_terms_m256", lambda: textstats.heavy_terms(soak_dir, m=256)
    )
    assert hh_trunc["term"].tolist() == hh_exact["term"].tolist()
    assert hh_trunc["n"].tolist() == hh_exact["n"].tolist()
    out["heavy_top1"] = f"{hh_exact['term'].iloc[0]}:{int(hh_exact['n'].iloc[0])}"

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
