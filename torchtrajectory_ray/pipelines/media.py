"""Multimodal feature-extraction pipeline (see stages/multimodal.py for
the codec contract).  The media table is synthesized deterministically
(media_id derived range; no testdata table exists for media), staged to
parquet once per size, then processed by the actor-pool extractor with a
small batch size — the wide-binary-rows memory pattern."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import ray.data

from torchtrajectory_ray.stages.multimodal import (
    MediaFeatureExtractor,
    fixtures_media_table,
)

CACHE_ROOT = "/tmp/ttray_cache"


MEDIA_FORMAT_VERSION = 2  # bump when fixtures_media_table/codecs change


def media_corpus(n: int = 300, num_files: int = 4) -> list[str]:
    out_dir = os.path.join(
        CACHE_ROOT, f"media-v{MEDIA_FORMAT_VERSION}-{n}-{num_files}"
    )
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"media-{i:04d}.parquet") for i in range(num_files)
    ]
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return paths
    per = n // num_files
    for i, p in enumerate(paths):
        cnt = per if i < num_files - 1 else n - per * (num_files - 1)
        pq.write_table(fixtures_media_table(cnt, start=i * per), p + ".tmp")
        os.replace(p + ".tmp", p)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def media_features(sf_dir: str | None = None, n: int = 300) -> pd.DataFrame:
    """media_id, kind, n_bytes, feat_dim, mean_value, n_frames_sampled —
    decode + feature extraction over the deterministic media corpus.
    ``sf_dir`` is accepted (driver contract) but unused: media payloads
    are synthesized, not part of the sf tables."""
    ds = ray.data.read_parquet(media_corpus(n))
    feats = ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=32,          # binary rows are wide — keep batches small
        concurrency=(1, 4),     # actor pool: codec state loads once/actor
        num_cpus=1,
    )
    # drop the wide per-image float lists BEFORE shipping to the driver
    df = feats.drop_columns(["resized"]).to_pandas()
    return df.sort_values("media_id").reset_index(drop=True)
