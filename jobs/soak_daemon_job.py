#!/usr/bin/env python
"""Continuous-ingest daemon soak: WARC files arrive in waves, each tick
converts + appends one micro-batch generation, and the final live index
must answer rank-identically to a one-shot rebuild over every shard.

Measures the per-tick constants of the streaming-replay path (the
reference's Simulator shape) at crawl-shard scale.

Usage: python jobs/soak_daemon_job.py [--waves 5] [--docs-per-wave 20000]
       [--cpus 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SOAK_ROOT = "/tmp/ttray_soak"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=5)
    ap.add_argument("--docs-per-wave", type=int, default=20_000)
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

    import numpy as np

    from torchtrajectory_ray import fixtures, oracle
    from torchtrajectory_ray.pipelines import ingest
    from torchtrajectory_ray.pipelines.build import build_index
    from torchtrajectory_ray.state.engine import QueryEngine

    base = os.path.join(
        SOAK_ROOT, f"daemon-{args.waves}x{args.docs_per_wave}"
    )
    shutil.rmtree(base, ignore_errors=True)
    watch = os.path.join(base, "watch")
    work = os.path.join(base, "work")
    idx = os.path.join(base, "live")
    os.makedirs(watch)

    out: dict = {
        "waves": args.waves,
        "docs_per_wave": args.docs_per_wave,
        "cpus": args.cpus,
        "ticks": [],
    }
    files_per_wave = max(4, args.cpus // 4)
    per_file = -(-args.docs_per_wave // files_per_wave)
    n_total = 0

    # serve-during-extend probe (the commit-point property at soak
    # scale, round-5): from wave 2 on, a thread opens FRESH engines and
    # records (n_docs, OR-match count) while the tick appends its
    # generation.  Every sample must equal the pre-tick or post-tick
    # snapshot IN FULL — a torn manifest/dictionary/segment update
    # would disagree between the two facts.
    import threading

    probe_terms: list[str] | None = None
    gen_snapshots: list[tuple] = []
    torn_samples: list[tuple] = []
    n_probe_samples = 0

    def observe() -> tuple:
        eng = QueryEngine(idx)
        return (int(eng.n_docs), int(len(eng.bool_or(probe_terms))))

    for w in range(args.waves):
        # the wave "arrives": several WARC files drop into the watch dir
        t0 = time.monotonic()
        for f in range(files_per_wave):
            start = n_total + f * per_file
            fixtures.write_warc(
                os.path.join(watch, f"wave{w:02d}-{f:02d}.warc"),
                per_file,
                start,
            )
        gen_s = round(time.monotonic() - t0, 1)
        n_total += files_per_wave * per_file

        samples: list[tuple] = []
        stop = threading.Event()

        def prober() -> None:
            while not stop.is_set():
                samples.append(observe())
                time.sleep(0.05)

        th = None
        if probe_terms is not None:
            th = threading.Thread(target=prober)
            th.start()
        t0 = time.monotonic()
        res = ingest.ingest_tick(watch, work, idx)
        tick_s = max(round(time.monotonic() - t0, 1), 0.1)
        if th is not None:
            stop.set()
            th.join()
        if probe_terms is None:
            # derive a stable probe workload from the first generation
            import pyarrow.parquet as _pq

            eng0 = QueryEngine(idx)
            t = _pq.read_table(eng0.docs_paths[0], columns=["text"])
            probe_terms = t["text"][0].as_py().split(" ")[:2]
        post = observe()
        valid = {post} | ({gen_snapshots[-1]} if gen_snapshots else set())
        torn_samples.extend(s for s in samples if s not in valid)
        n_probe_samples += len(samples)
        gen_snapshots.append(post)
        out["ticks"].append(
            {
                "wave": w,
                "gen_s": gen_s,
                "tick_s": tick_s,
                "n_new_shards": res["n_new"],
                "generation": res["generation"],
                "docs_per_s": round(files_per_wave * per_file / tick_s, 0),
                "probe_samples": len(samples),
            }
        )
    out["n_probe_samples"] = n_probe_samples
    out["n_torn_samples"] = len(torn_samples)
    assert not torn_samples, f"mixed-generation reads: {torn_samples[:5]}"

    # identity gate: live index == one-shot rebuild over the same shards
    shards = sorted(glob.glob(os.path.join(work, "pages", "*.parquet")))
    full = os.path.join(base, "full")
    t0 = time.monotonic()
    build_index(shards, full)
    out["oneshot_build_s"] = round(time.monotonic() - t0, 1)
    ei, ef = QueryEngine(idx), QueryEngine(full)
    out["n_docs"] = int(ei.n_docs)
    assert ei.n_docs == ef.n_docs == n_total
    # workload terms from the corpus dictionary (hot + mid + rare)
    import pyarrow.parquet as pq

    t = pq.read_table(ei.docs_paths[0], columns=["doc_id", "text"])
    orc = oracle.build_oracle(
        t["doc_id"].to_pylist(), t["text"].to_pylist()
    )
    vocab = sorted(orc.postings, key=lambda x: -len(orc.postings[x]))
    rank_identical = True
    for terms in ([vocab[0]], vocab[:3], [vocab[len(vocab) // 2], vocab[0]]):
        a, b = ei.topk(terms, k=10), ef.topk(terms, k=10)
        if [x[0] for x in a] != [x[0] for x in b] or not np.allclose(
            [x[1] for x in a], [x[1] for x in b], atol=1e-12
        ):
            rank_identical = False
    out["rank_identical_vs_oneshot"] = bool(rank_identical)
    out["total_tick_s"] = max(
        round(sum(t["tick_s"] for t in out["ticks"]), 1), 0.1
    )
    out["daemon_docs_per_s"] = round(n_total / out["total_tick_s"], 0)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
