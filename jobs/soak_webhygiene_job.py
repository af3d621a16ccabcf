#!/usr/bin/env python
"""1M-doc soak of the URL-hygiene family (webhygiene.py).

2000× the sf0.01 gate scale over soak_clean_job's deterministic sharded
corpus.  Each pipeline is consumed with a streaming aggregate — the
canonical-URL table never reaches the driver — and the run certifies
itself with the arithmetic invariants of the synthesis:

- ``url_dedup``       — Σ n_crawls == n_docs, pages == ceil(n/3)
- ``domain_stats``    — Σ n_docs == n_docs, Σ n_pages == ceil(n/3),
                        exactly 97 hosts
- ``blocklist_summary`` — Σ (kept + blocked) == n_docs, blocked > 0

Usage:  python jobs/soak_webhygiene_job.py [--n-docs 1000000] [--cpus 32]
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

    from ray.data.aggregate import Count, Max, Sum

    from jobs.soak_clean_job import build_corpus
    from torchtrajectory_ray.pipelines import webhygiene as wh

    t0 = time.monotonic()
    soak_dir = build_corpus(args.n_docs)
    out: dict = {
        "n_docs": args.n_docs,
        "cpus": args.cpus,
        "gen_s": round(time.monotonic() - t0, 1),
    }
    n = args.n_docs
    n_pages = -(-n // 3)

    t = time.monotonic()
    agg = wh.url_dedup(soak_dir).aggregate(
        Count(), Sum("n_crawls"), Max("n_crawls")
    )
    out["url_dedup_s"] = round(time.monotonic() - t, 1)
    out["url_dedup_docs_per_s"] = round(n / out["url_dedup_s"], 1)
    assert agg["count()"] == n_pages, agg
    assert agg["sum(n_crawls)"] == n, agg
    assert agg["max(n_crawls)"] == 3, agg

    t = time.monotonic()
    dom = wh.domain_stats(soak_dir).to_pandas()  # 97 rows
    out["domain_stats_s"] = round(time.monotonic() - t, 1)
    assert len(dom) == 97, len(dom)
    assert int(dom["n_docs"].sum()) == n
    assert int(dom["n_pages"].sum()) == n_pages

    t = time.monotonic()
    bl = wh.blocklist_summary(soak_dir).to_pandas()
    out["blocklist_s"] = round(time.monotonic() - t, 1)
    assert int((bl["n_kept"] + bl["n_blocked"]).sum()) == n
    assert int(bl["n_blocked"].sum()) > 0
    out["blocked_docs"] = int(bl["n_blocked"].sum())

    # link graph at 1M docs THROUGH the exchange path (the fast-path
    # merge is pinned off so the 256-way pair-hash exchange is what
    # soaks): Σ n_links == Σ_i (i % 4), src/dst host spaces == 97
    wh.LOCAL_LINKGRAPH_MAX_DOCS = 0
    t = time.monotonic()
    edges = wh.host_link_edges(soak_dir).to_pandas()  # ≤ 97² rows
    out["link_edges_s"] = round(time.monotonic() - t, 1)
    out["link_edges_docs_per_s"] = round(n / out["link_edges_s"], 1)
    want_links = sum(i % 4 for i in range(n))
    assert int(edges["n_links"].sum()) == want_links, (
        int(edges["n_links"].sum()),
        want_links,
    )
    assert edges["src_host"].nunique() == 97
    t = time.monotonic()
    st = wh.host_outlink_stats(soak_dir).to_pandas()
    out["outlink_stats_s"] = round(time.monotonic() - t, 1)
    assert len(st) == 97 and int(st["n_links"].sum()) == want_links

    out["total_s"] = round(time.monotonic() - t0, 1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
