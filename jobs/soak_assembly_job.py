#!/usr/bin/env python
"""1M-doc soak of the training-set-assembly operators.

Measures the round-3 additions at 2000× the sf0.01 gate scale so their
constants are known, not assumed (reuses soak_clean_job's deterministic
sharded corpus):

- ``pack_sequences`` — the two-pass distributed prefix scan (pass 1
  per-range totals, pass 2 pushdown range tasks)
- ``stratified_sample`` — pure per-batch filter
- ``decontaminate`` — broadcast benchmark-gram membership
- ``repetition_stats`` — flatten-factorize bigram reductions

Usage:  python jobs/soak_assembly_job.py [--n-docs 1000000] [--cpus 32]
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
    from torchtrajectory_ray.pipelines import (
        decontaminate,
        pack,
        sampling,
        textstats,
    )

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
        out[f"{name}_s"] = round(time.monotonic() - t, 2)
        out[f"{name}_docs_per_s"] = int(args.n_docs / (time.monotonic() - t))
        return r

    packed = timed("pack_sequences", lambda: pack.pack_sequences(soak_dir))
    # consume the stream: count rows + max bin (cheap aggregate)
    from ray.data.aggregate import Count, Max, Sum

    # NOTE: Count() without on= silently returns 0 in Ray 2.49 when it is
    # the only aggregate (it works combined with column aggregates, and in
    # groupby); always pass on=.
    agg = packed.aggregate(
        Count(on="doc_id", alias_name="n"),
        Max("bin_id", alias_name="max_bin"),
        Sum("n_tokens", alias_name="total_tokens"),
    )
    out["packed_rows"] = int(agg["n"])
    out["n_bins"] = int(agg["max_bin"]) + 1
    out["total_tokens"] = int(agg["total_tokens"])
    # pack timing above stops at Dataset creation (lazy); redo end-to-end
    t = time.monotonic()
    pack.pack_sequences(soak_dir).aggregate(Count(on="doc_id", alias_name="n"))
    wall = time.monotonic() - t
    out["pack_sequences_s"] = round(wall, 2)
    out["pack_sequences_docs_per_s"] = int(args.n_docs / wall)

    sample = timed(
        "stratified_sample",
        lambda: sampling.stratified_sample(soak_dir).aggregate(
            Count(on="doc_id", alias_name="n")
        ),
    )
    out["sampled_rows"] = int(sample["n"])

    decon = timed(
        "decontaminate",
        lambda: decontaminate.decontaminate(soak_dir, n=3).aggregate(
            Count(on="doc_id", alias_name="n")
        ),
    )
    out["flagged_rows"] = int(decon["n"])

    rep = timed(
        "repetition_stats",
        lambda: textstats.repetition_stats(soak_dir).aggregate(
            Count(on="doc_id", alias_name="n")
        ),
    )
    out["repetition_rows"] = int(rep["n"])

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
