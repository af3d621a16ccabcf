#!/usr/bin/env python
"""Continuous-ingest daemon: watch a directory for new WARC / JSONL /
parquet page files, convert them, and append each micro-batch to a live
index as a new generation (pipelines/ingest.py).  The streaming-replay
driver shape of the reference's Simulator (clustering/Streaming/
Simulator.java:10-105) over the Lucene-style generation append.

Usage:
  python jobs/ingest_daemon_job.py --watch /data/incoming \
      --work /tmp/ingest_work --index /tmp/live_index \
      [--poll 5] [--cpus 32] [--idle-stop 3] [--max-ticks N]

Each tick prints one JSON line; --idle-stop N exits after N consecutive
empty polls (omit to run forever).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--idle-stop", type=int, default=None)
    ap.add_argument("--max-ticks", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )

    from torchtrajectory_ray.pipelines.ingest import ingest_daemon

    ingest_daemon(
        args.watch,
        args.work,
        args.index,
        poll_s=args.poll,
        max_ticks=args.max_ticks,
        idle_stop_after=args.idle_stop,
        on_tick=lambda r: print(json.dumps(r), flush=True),
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
