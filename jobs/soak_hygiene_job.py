#!/usr/bin/env python
"""1M-doc soak of the corpus-hygiene + LM-statistics operators.

Measures the round-3 hygiene additions at 2000× the sf0.01 gate scale
(reuses soak_clean_job's deterministic sharded corpus).  Every pipeline
is consumed with a streaming aggregate — nothing materializes the
output corpus on the driver:

- ``line_dedup`` — distinct-line df shuffle (~1M distinct body lines) +
  broadcast scrub
- ``pii_scrub`` — three-regex redaction stream
- ``chunk_documents`` — sliding-window flat emission (~7× row fanout)
- ``source_mix_sample`` — per-source token groupby + filtered stream
- ``lm_quality`` — corpus unigram table + searchsorted/reduceat scoring
- ``doc_keywords`` — doc-frequency table + per-batch (doc, term) tf

Usage:  python jobs/soak_hygiene_job.py [--n-docs 1000000] [--cpus 32]
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

    from ray.data.aggregate import Count, Sum

    from jobs.soak_clean_job import build_corpus
    from torchtrajectory_ray.pipelines import lines, lm, pack, sampling, scrub

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

    r = timed(
        "line_dedup",
        lambda: lines.line_dedup(soak_dir).aggregate(
            Sum(on="n_removed", alias_name="removed"),
            Count(on="doc_id", alias_name="n"),
        ),
    )
    out["line_dedup_removed"] = int(r["removed"])
    assert r["n"] == args.n_docs

    r = timed(
        "pii_scrub",
        lambda: scrub.pii_scrub(soak_dir).aggregate(
            Sum(on="n_emails", alias_name="emails"),
            Sum(on="n_ips", alias_name="ips"),
            Sum(on="n_phones", alias_name="phones"),
        ),
    )
    out["pii_redactions"] = int(r["emails"] + r["ips"] + r["phones"])

    r = timed(
        "chunk_documents",
        lambda: pack.chunk_documents(soak_dir).aggregate(
            Count(on="doc_id", alias_name="chunks"),
            Sum(on="n_tokens", alias_name="toks"),
        ),
    )
    out["chunks"] = int(r["chunks"])

    r = timed(
        "source_mix_sample",
        lambda: sampling.source_mix_sample(soak_dir).aggregate(
            Count(on="doc_id", alias_name="kept")
        ),
    )
    out["mix_kept"] = int(r["kept"])

    r = timed(
        "lm_quality",
        lambda: lm.lm_quality(soak_dir).aggregate(
            Sum(on="nll", alias_name="nll_sum"),
            Count(on="doc_id", alias_name="n"),
        ),
    )
    out["mean_nll"] = round(float(r["nll_sum"]) / r["n"], 3)

    # DSIR at the exchange worst case: every doc is target-lang (ct ==
    # cr, llr == 0) and exact mode shuffles the FULL distinct-bigram
    # table (millions of string keys — the line_dedup cost shape).
    # Hashed mode with the paper's 10k buckets bounds each batch's
    # partial to <=10k int rows — the exchange all but disappears.
    r = timed(
        "dsir_exact",
        lambda: lm.dsir_weights(soak_dir).aggregate(
            Count(on="doc_id", alias_name="n")
        ),
    )
    assert r["n"] == args.n_docs
    r = timed(
        "dsir_hashed_10k_buckets",
        lambda: lm.dsir_weights_ds(
            lambda: __import__("ray").data.read_parquet(
                os.path.join(soak_dir, "documents.parquet"),
                columns=["doc_id", "lang", "text"],
            ),
            n_buckets=10_000,
        ).aggregate(Count(on="doc_id", alias_name="n")),
    )
    assert r["n"] == args.n_docs

    r = timed(
        "doc_keywords",
        lambda: lm.doc_keywords(soak_dir).aggregate(
            Count(on="doc_id", alias_name="rows")
        ),
    )
    out["keyword_rows"] = int(r["rows"])

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
