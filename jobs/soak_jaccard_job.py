#!/usr/bin/env python
"""Large-corpus soak of the EXACT near-dup chain: prefix-filter
all-pairs n-gram Jaccard → hash-to-min connected components.

Reuses soak_clean_job's deterministic planted corpus (4% exact dups,
4% 2-token near dups), so the exact chain has real work: exact-dup
groups share every shingle and near dups sit at J ≈ 0.9.  Reports the
prefix-filter's candidate economy (prefix rows vs total shingle rows,
candidates vs verified pairs), the component census, and docs/s.

Usage:  python jobs/soak_jaccard_job.py [--n-docs 200000] [--cpus 32]
        [--threshold 0.8] [--freq-topk 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.soak_clean_job import build_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--freq-topk", type=int, default=4096)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    t0 = time.monotonic()
    soak_dir = build_corpus(args.n_docs)
    gen_s = round(time.monotonic() - t0, 1)

    import numpy as np
    import ray.data

    from torchtrajectory_ray.pipelines import dedup

    out: dict = {
        "n_docs": args.n_docs,
        "cpus": args.cpus,
        "threshold": args.threshold,
        "freq_topk": args.freq_topk,
        "gen_s": gen_s,
    }

    # candidate-economy audit: how many rows does the prefix filter emit
    # vs the full distinct-shingle row count?
    docs = ray.data.read_parquet(
        os.path.join(soak_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    t0 = time.monotonic()
    rank = dedup._frequent_shingle_ranks(docs, 3, args.freq_topk)
    out["df_pass_s"] = round(time.monotonic() - t0, 1)
    kw = dict(threshold=args.threshold, k=3, freq_rank=rank)
    t0 = time.monotonic()
    prefix_rows = docs.map_batches(
        dedup._prefix_rows_task, fn_kwargs=kw, batch_format="pyarrow"
    ).count()
    all_rows = docs.map_batches(
        dedup._prefix_rows_task,
        fn_kwargs=dict(threshold=0.0, k=3, freq_rank=rank),
        batch_format="pyarrow",
    ).count()
    out["prefix_rows"] = int(prefix_rows)
    out["shingle_rows"] = int(all_rows)
    out["prefix_fraction"] = round(prefix_rows / max(all_rows, 1), 4)
    out["audit_s"] = round(time.monotonic() - t0, 1)

    # pairs NEVER materialize as a driver DataFrame at soak scale: the
    # verified pair Dataset is written to parquet, components consume
    # the files, and the driver only sees streamed per-batch summaries
    import shutil

    pairs_dir = os.path.join(soak_dir, "jaccard_pairs")
    shutil.rmtree(pairs_dir, ignore_errors=True)
    t0 = time.monotonic()
    dedup.ngram_jaccard_pairs_ds(
        soak_dir, threshold=args.threshold, freq_topk=args.freq_topk
    ).write_parquet(pairs_dir)
    out["jaccard_s"] = round(time.monotonic() - t0, 1)
    # candidate economy of the pair stage itself (re-derived; the
    # in-line chain streams candidates straight into verification)
    src = os.path.join(soak_dir, "documents.parquet")
    docs2 = ray.data.read_parquet(src, columns=["doc_id", "text"])
    rank2 = dedup._frequent_shingle_ranks(docs2, 3, args.freq_topk)
    expand = dedup._PrefixGroupPairs(args.threshold, 4096)
    out["n_candidates"] = int(
        docs2.map_batches(
            dedup._prefix_rows_task,
            fn_kwargs=dict(
                threshold=args.threshold, k=3, freq_rank=rank2
            ),
            batch_format="pyarrow",
        )
        .map_batches(dedup._prefix_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: expand(t), batch_format="pyarrow")
        .map_batches(dedup._add_pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(
            dedup._PPJoinPairReduce(args.threshold).__call__,
            batch_format="pandas",
        )
        .count()
    )
    pairs_ds = ray.data.read_parquet(pairs_dir)

    def pair_stats(t):
        import pandas as pd

        return pd.DataFrame(
            {
                "n": [t.num_rows],
                "exact": [
                    int((t["jaccard"].to_numpy() >= 0.999999).sum())
                    if t.num_rows
                    else 0
                ],
            }
        )

    ps = pairs_ds.map_batches(pair_stats, batch_format="pyarrow").to_pandas()
    out["pairs"] = int(ps["n"].sum())
    out["jaccard_docs_per_s"] = round(args.n_docs / out["jaccard_s"], 0)
    out["exact_pairs"] = int(ps["exact"].sum())

    t0 = time.monotonic()
    comps_ds = dedup.connected_components_ds(pairs_ds).materialize()
    out["components_s"] = round(time.monotonic() - t0, 1)

    # component census as a distributed aggregate (rep_id groupby), not
    # a driver table of all labeled nodes
    census = comps_ds.groupby("rep_id").count().to_pandas()
    sizes = census["count()"].to_numpy()

    def drop_stats(t):
        import pandas as pd

        d = t["doc_id"].to_numpy()
        r = t["rep_id"].to_numpy()
        return pd.DataFrame({"n": [len(d)], "dropped": [int((d != r).sum())]})

    dstat = comps_ds.map_batches(drop_stats, batch_format="pyarrow").to_pandas()
    out["nodes_in_components"] = int(dstat["n"].sum())
    out["n_components"] = int(len(sizes))
    out["max_component"] = int(sizes.max()) if len(sizes) else 0
    out["docs_dropped"] = int(dstat["dropped"].sum())

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
