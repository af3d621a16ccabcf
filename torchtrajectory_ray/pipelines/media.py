"""Multimodal feature-extraction pipeline (see stages/multimodal.py for
the codec contract).  The media table is synthesized deterministically
(media_id derived range; no testdata table exists for media), staged to
parquet once per size, then processed by the actor-pool extractor with a
small batch size — the wide-binary-rows memory pattern."""

from __future__ import annotations

import os

import numpy as np
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


PLANTED_IMAGE_DUPS = 40   # image i and 1000+i are planted near-dups
PLANTED_AUDIO_DUPS = 30   # clip i and 2000+i are planted gain-shifted dups
_N_IMAGES = 240
_N_AUDIO = 180


def image_corpus(num_files: int = 4) -> list[str]:
    """Deterministic REAL-format (binary PPM) image corpus with planted
    near-duplicates: image ``1000+i`` is image ``i`` with a uniform +1
    brightness shift and one corner pixel saturated (dhash-invariant
    monotone shift plus ≤2 flipped gradient bits) for
    i < PLANTED_IMAGE_DUPS."""
    import numpy as np
    import pyarrow as pa

    from torchtrajectory_ray.stages.multimodal import encode_ppm, _decode_ppm

    out_dir = os.path.join(CACHE_ROOT, f"imagedup-v1-{_N_IMAGES}-{num_files}")
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"img-{i:04d}.parquet") for i in range(num_files)
    ]
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return paths
    ids, payloads = [], []
    for i in range(_N_IMAGES):
        ids.append(i)
        payloads.append(encode_ppm(i, 24 + i % 7, 20 + i % 5))
    for i in range(PLANTED_IMAGE_DUPS):
        _, img = _decode_ppm(payloads[i])
        pert = np.minimum(img.astype(np.int32) + 1, 255).astype(np.uint8)
        pert[0, 0] = 255
        h, w = pert.shape[:2]
        ids.append(1000 + i)
        payloads.append(
            f"P6\n{w} {h}\n255\n".encode() + pert.tobytes()
        )
    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )
    per = -(-tbl.num_rows // num_files)
    for i, p in enumerate(paths):
        import pyarrow.parquet as _pq

        _pq.write_table(tbl.slice(i * per, per), p + ".tmp")
        os.replace(p + ".tmp", p)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def audio_corpus(num_files: int = 4) -> list[str]:
    """Deterministic REAL-format (PCM WAV) audio corpus with planted
    duplicates: clip ``2000+i`` is clip ``i`` re-encoded at 1.25×
    amplitude (the fingerprint's gain invariance) for
    i < PLANTED_AUDIO_DUPS."""
    import io
    import wave

    import numpy as np
    import pyarrow as pa

    from torchtrajectory_ray.stages.multimodal import _decode_wav, encode_wav

    out_dir = os.path.join(CACHE_ROOT, f"audiodup-v1-{_N_AUDIO}-{num_files}")
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"wav-{i:04d}.parquet") for i in range(num_files)
    ]
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return paths
    ids, payloads = [], []
    for i in range(_N_AUDIO):
        ids.append(i)
        payloads.append(encode_wav(i, 2400 + (i % 9) * 128))
    for i in range(PLANTED_AUDIO_DUPS):
        _, arr = _decode_wav(payloads[i])
        gained = np.clip(
            arr.astype(np.float64) * 1.25, -32768, 32767
        ).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(gained.tobytes())
        ids.append(2000 + i)
        payloads.append(buf.getvalue())
    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )
    per = -(-tbl.num_rows // num_files)
    import pyarrow.parquet as _pq

    for i, p in enumerate(paths):
        _pq.write_table(tbl.slice(i * per, per), p + ".tmp")
        os.replace(p + ".tmp", p)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


PLANTED_VIDEO_DUPS = 24  # video i and 3000+i are planted near-dups
_N_VIDEOS = 150


def video_corpus(num_files: int = 4) -> list[str]:
    """Deterministic video corpus (the fake frame-stack container —
    decode is format plumbing, the SIGNATURE math is real) with planted
    near-duplicates: video ``3000+i`` is video ``i`` with a uniform +1
    brightness shift on every frame and one corner pixel of frame 0
    saturated (per-frame dHash monotone invariance + the majority fold
    absorbing the single-frame edit) for i < PLANTED_VIDEO_DUPS."""
    import struct

    import pyarrow as pa

    from torchtrajectory_ray.stages.multimodal import (
        MAGIC,
        decode_payload,
        encode_fake_video,
    )

    out_dir = os.path.join(CACHE_ROOT, f"videodup-v1-{_N_VIDEOS}-{num_files}")
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"vid-{i:04d}.parquet") for i in range(num_files)
    ]
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return paths
    ids, payloads = [], []
    for i in range(_N_VIDEOS):
        ids.append(i)
        payloads.append(
            encode_fake_video(i, 8 + i % 5, 12 + i % 5, 10 + i % 4)
        )
    for i in range(PLANTED_VIDEO_DUPS):
        _, frames = decode_payload(payloads[i])
        pert = np.minimum(frames.astype(np.int32) + 1, 255).astype(np.uint8)
        pert[0, 0, 0] = 255
        f, h, w = pert.shape
        ids.append(3000 + i)
        payloads.append(
            MAGIC + b"V" + struct.pack("<HHB", h, w, 1)
            + struct.pack("<H", f) + pert.tobytes()
        )
    tbl = pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )
    per = -(-tbl.num_rows // num_files)
    for i, p in enumerate(paths):
        pq.write_table(tbl.slice(i * per, per), p + ".tmp")
        os.replace(p + ".tmp", p)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def _hash_band_pairs(
    rows: "ray.data.Dataset", max_hamming: int
) -> pd.DataFrame:
    """(media_id, hash64) Dataset → hamming-verified near-dup pairs via
    the 4×16-bit pigeonhole banding (shared shape with the SimHash text
    chain: band groupby → pair-partitioned dedupe + popcount verify)."""
    import numpy as np
    import pyarrow as pa

    from torchtrajectory_ray.pipelines.dedup import (
        N_BUCKET_PARTS,
        _add_pair_part,
        _collect_pairs,
    )

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_numpy().astype(np.int64)
        h = t["hash64"].to_numpy().astype(np.uint64)
        n = len(ids)
        band_idx = np.arange(4, dtype=np.uint64)
        vals = (
            (h[:, None] >> (np.uint64(16) * band_idx[None, :]))
            & np.uint64(0xFFFF)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "hash64": pa.array(np.repeat(h.view(np.int64), 4), pa.int64()),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                "band_val": pa.array(vals.reshape(-1)),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        bv = t["band_val"].to_numpy().astype(np.int64)
        band = t["band"].to_numpy().astype(np.int64)
        part = ((bv * 31 + band) % N_BUCKET_PARTS).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def pairs(t: pa.Table) -> pd.DataFrame:
        from torchtrajectory_ray.pipelines.dedup import MAX_BUCKET

        ids = t["doc_id"].to_numpy().astype(np.int64)
        band = t["band"].to_numpy().astype(np.int64)
        bv = t["band_val"].to_numpy().astype(np.int64)
        hh = t["hash64"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, bv, band))
        ids, band, bv, hh = ids[order], band[order], bv[order], hh[order]
        change = (band[1:] != band[:-1]) | (bv[1:] != bv[:-1])
        heads = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((heads[1:], [len(ids)]))
        a, b, ha, hb, cap = [], [], [], [], []
        for s, e in zip(heads, ends):
            u, first = np.unique(ids[s:e], return_index=True)
            if len(u) < 2:
                continue
            uh = hh[s:e][first]
            if len(u) > MAX_BUCKET:
                # degenerate bucket (mass-duplicated asset): star
                # expansion keeps connectivity at O(n) pairs instead of
                # a quadratic blowup — same policy as the text LSH.
                # Spoke↔spoke pairs are NOT emitted, so (like the text
                # chain) these rows carry capped=True: two spokes within
                # max_hamming of each other but both beyond it from the
                # hub would otherwise be lost invisibly.
                a.append(np.full(len(u) - 1, u[0]))
                b.append(u[1:])
                ha.append(np.full(len(u) - 1, uh[0]))
                hb.append(uh[1:])
                cap.append(np.full(len(u) - 1, True))
                continue
            ia, ib = np.triu_indices(len(u), k=1)
            a.append(u[ia]); b.append(u[ib]); ha.append(uh[ia]); hb.append(uh[ib])
            cap.append(np.full(len(ia), False))
        if not a:
            return pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "h_a": np.array([], np.int64),
                    "h_b": np.array([], np.int64),
                    "capped": np.array([], bool),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(a),
                "doc_b": np.concatenate(b),
                "h_a": np.concatenate(ha),
                "h_b": np.concatenate(hb),
                "capped": np.concatenate(cap),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "hamming": np.array([], np.int64),
                "capped": np.array([], bool),
            }
        )
        g = g.drop(columns=["pp"])
        if g.empty:
            return empty
        # OR capped across duplicate copies of a pair (a pair can appear
        # from both a normal band and a star-expanded one)
        g = g.groupby(["doc_a", "doc_b", "h_a", "h_b"], as_index=False).agg(
            capped=("capped", "max")
        )
        x = g["h_a"].to_numpy().astype(np.uint64) ^ g["h_b"].to_numpy().astype(
            np.uint64
        )
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        out = g.assign(hamming=ham)
        return out[out["hamming"] <= max_hamming][
            ["doc_a", "doc_b", "hamming", "capped"]
        ].reset_index(drop=True)

    out = (
        rows.map_batches(band_rows, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(_add_pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    return _collect_pairs(out, ["doc_a", "doc_b", "hamming", "capped"])


def image_dhash_dups(sf_dir: str | None = None, max_hamming: int = 3) -> pd.DataFrame:
    """(doc_a, doc_b) image near-dup pairs over the planted PPM corpus:
    actor-pool decode → dhash64 → banded pigeonhole pairs → hamming
    verify.  The corpus is deterministic, so the ground-truth pair set
    (i, 1000+i) IS the oracle — the pipeline must DISCOVER it from the
    pixels.  ``sf_dir`` accepted per the driver contract (media is
    synthesized, not an sf table)."""
    import pyarrow as pa

    from torchtrajectory_ray.stages.multimodal import decode_payload, dhash64

    def hash_batch(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for mid, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            _, img = decode_payload(payload)
            ids.append(mid)
            hs.append(int(np.uint64(dhash64(img)).astype(np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "hash64": pa.array(hs, pa.int64()),
            }
        )

    rows = ray.data.read_parquet(image_corpus()).map_batches(
        hash_batch, batch_format="pyarrow", batch_size=32
    )
    pairs = _hash_band_pairs(rows, max_hamming)
    return pairs[["doc_a", "doc_b"]].reset_index(drop=True)


def audio_fp_dups(sf_dir: str | None = None) -> pd.DataFrame:
    """(doc_a, doc_b) audio duplicate pairs over the planted WAV corpus:
    actor-pool REAL WAV decode → MFCC-lite sign-of-delta fingerprint →
    banded pairs at hamming ≤ 2 (gain-shifted copies share the exact
    fingerprint; the slack covers clip/rounding at saturated samples).
    Ground truth (i, 2000+i) is the deterministic oracle."""
    import pyarrow as pa

    from torchtrajectory_ray.stages.multimodal import (
        audio_fingerprint64,
        decode_payload,
    )

    def hash_batch(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for mid, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            _, arr = decode_payload(payload)
            ids.append(mid)
            hs.append(int(np.uint64(audio_fingerprint64(arr)).astype(np.int64)))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "hash64": pa.array(hs, pa.int64()),
            }
        )

    rows = ray.data.read_parquet(audio_corpus()).map_batches(
        hash_batch, batch_format="pyarrow", batch_size=32
    )
    pairs = _hash_band_pairs(rows, max_hamming=2)
    return pairs[["doc_a", "doc_b"]].reset_index(drop=True)


def video_dhash_dups(
    sf_dir: str | None = None,
    frame_stride: int = 2,
    max_hamming: int = 3,
) -> pd.DataFrame:
    """(doc_a, doc_b) video near-dup pairs over the planted corpus:
    actor-pool decode → frame-sample (every ``frame_stride``-th frame)
    → per-frame dhash64 → per-bit majority fold
    (multimodal.video_signature64) → banded pigeonhole pairs → hamming
    verify.  Ground truth (i, 3000+i) is the deterministic oracle; the
    pipeline must REDISCOVER it from the decoded frame stacks.
    ``sf_dir`` accepted per the driver contract (media is synthesized,
    not an sf table)."""
    import pyarrow as pa

    from torchtrajectory_ray.stages.multimodal import (
        decode_payload,
        video_signature64,
    )

    def hash_batch(t: pa.Table) -> pa.Table:
        ids, hs = [], []
        for mid, payload in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist()
        ):
            _, frames = decode_payload(payload)
            ids.append(mid)
            hs.append(
                int(
                    np.uint64(
                        video_signature64(frames, frame_stride)
                    ).astype(np.int64)
                )
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "hash64": pa.array(hs, pa.int64()),
            }
        )

    rows = ray.data.read_parquet(video_corpus()).map_batches(
        hash_batch, batch_format="pyarrow", batch_size=32
    )
    pairs = _hash_band_pairs(rows, max_hamming)
    return pairs[["doc_a", "doc_b"]].reset_index(drop=True)


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
