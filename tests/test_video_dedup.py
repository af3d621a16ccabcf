"""Video near-duplicate detection (stages/multimodal.video_signature64 +
pipelines/media.video_dhash_dups): the per-frame-dHash majority fold
must be invariant to monotone brightness maps, absorb single-frame
edits, and rediscover the planted (i, 3000+i) pair set exactly — the
constant ground-truth table is the driver oracle."""

from __future__ import annotations

import numpy as np
import pytest

from torchtrajectory_ray.stages.multimodal import (
    decode_payload,
    encode_fake_video,
    video_signature64,
)


def _frames(seed: int, f: int = 9, h: int = 14, w: int = 12) -> np.ndarray:
    _, arr = decode_payload(encode_fake_video(seed, f, h, w))
    return arr


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_signature_brightness_invariance():
    for seed in range(6):
        fr = _frames(seed)
        shifted = np.minimum(fr.astype(np.int32) + 1, 255).astype(np.uint8)
        assert _ham(
            video_signature64(fr), video_signature64(shifted)
        ) <= 2, seed  # saturation plateaus may flip isolated gradients


def test_signature_absorbs_single_frame_edit():
    fr = _frames(3)
    edited = fr.copy()
    edited[0, 0, 0] = 255
    assert _ham(video_signature64(fr), video_signature64(edited)) <= 2


def test_signature_separates_different_videos():
    sigs = [video_signature64(_frames(s)) for s in range(20)]
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            assert _ham(sigs[i], sigs[j]) > 3, (i, j)


def test_frame_stride_samples_fewer_frames():
    fr = _frames(5, f=12)
    # stride plumbing: stride==len means only frame 0 is hashed
    from torchtrajectory_ray.stages.multimodal import dhash64

    assert video_signature64(fr, frame_stride=12) == dhash64(fr[0])


def test_video_dhash_dups_exact_recovery(ray_session):
    from torchtrajectory_ray.pipelines.media import (
        PLANTED_VIDEO_DUPS,
        video_dhash_dups,
    )

    got = video_dhash_dups()
    exp = {(i, 3000 + i) for i in range(PLANTED_VIDEO_DUPS)}
    assert set(map(tuple, got.to_numpy())) == exp
    # the frame-sample knob must not lose the planted pairs
    got1 = video_dhash_dups(frame_stride=1)
    assert set(map(tuple, got1.to_numpy())) == exp
