"""Multimodal (image / audio / video) columns as opaque ``binary``
payloads with typed metadata, processed by actor-pool ``map_batches``
stages.

The heavyweight decode libraries (PIL / torchaudio / av) are NOT in
this container, so the codec layer is split three ways:

- REAL stdlib decodes: WAV (``wave`` module) and binary PPM/PGM
  (hand-parsed header — the formats ARE trivial) run end-to-end with no
  dependency at all, so at least one genuine media path is exercised in
  CI.
- Import-gated real decodes: JPEG via PIL when present; otherwise a
  clearly-marked ``NotImplementedError`` STUB (same for compressed WAV
  variants the stdlib reader rejects).
- The deterministic fake format produced by :func:`fixtures_media_table`
  decodes for real and covers video (no stdlib container parser
  exists).

Everything Ray-side is real and tested: the schema contract, the
actor-pool stage shape (decode state built once per actor), bounded
batch sizes for wide binary rows, and the typed feature output layout.

Fake payload format (deterministic, seeded by media_id):
``b"FAKE" + kind(1B: I/A/V) + h:uint16 + w:uint16 + c:uint8 [+ f:uint16]
+ payload bytes`` — pixels/samples are a pure function of media_id.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FAKE"


def encode_fake_image(media_id: int, h: int, w: int, c: int = 3) -> bytes:
    rng = np.random.default_rng(1000 + media_id)
    pix = rng.integers(0, 256, size=h * w * c, dtype=np.uint8)
    return MAGIC + b"I" + struct.pack("<HHB", h, w, c) + pix.tobytes()


def encode_fake_audio(media_id: int, n_samples: int) -> bytes:
    rng = np.random.default_rng(2000 + media_id)
    samples = (rng.standard_normal(n_samples) * 1000).astype(np.int16)
    # header length fields unused for audio (length = payload size; a
    # uint16 field would cap clips at 65535 samples)
    return MAGIC + b"A" + struct.pack("<HHB", 0, 0, 1) + samples.tobytes()


def encode_fake_video(media_id: int, frames: int, h: int, w: int) -> bytes:
    rng = np.random.default_rng(3000 + media_id)
    pix = rng.integers(0, 256, size=frames * h * w, dtype=np.uint8)
    return (
        MAGIC + b"V" + struct.pack("<HHB", h, w, 1)
        + struct.pack("<H", frames) + pix.tobytes()
    )


def encode_wav(media_id: int, n_samples: int, rate: int = 16000) -> bytes:
    """REAL mono 16-bit PCM WAV bytes (stdlib ``wave``), deterministic
    per media_id — the planted fixture for the genuine decode path."""
    import io
    import wave

    rng = np.random.default_rng(4000 + media_id)
    samples = (rng.standard_normal(n_samples) * 1000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def encode_ppm(media_id: int, h: int, w: int) -> bytes:
    """REAL binary PPM (P6) image bytes, deterministic per media_id."""
    rng = np.random.default_rng(5000 + media_id)
    pix = rng.integers(0, 256, size=h * w * 3, dtype=np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + pix.tobytes()


def _decode_wav(payload: bytes):
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as r:
            nch, width, n = r.getnchannels(), r.getsampwidth(), r.getnframes()
            raw = r.readframes(n)
    except (wave.Error, EOFError) as e:  # compressed/non-PCM/truncated
        raise NotImplementedError(
            "non-PCM WAV decode requires an audio library (not in this "
            "container); stdlib wave handles uncompressed PCM only"
        ) from e
    if width == 2:
        arr = np.frombuffer(raw, "<i2")
    elif width == 1:
        arr = np.frombuffer(raw, np.uint8).astype(np.int16) - 128
    else:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    if nch > 1:  # downmix to mono, deterministic
        arr = arr.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return "audio", arr


def _decode_ppm(payload: bytes):
    """Binary PPM (P6, RGB) / PGM (P5, gray) — whitespace+comment-tolerant
    header, then a raw pixel block."""
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM/PGM unsupported")
    c = 3 if payload[:2] == b"P6" else 1
    pix = np.frombuffer(payload, np.uint8, count=h * w * c, offset=pos)
    return "image", pix.reshape(h, w, c)


def decode_payload(payload: bytes):
    """payload → (kind, ndarray).  Stdlib formats (WAV, PPM/PGM) decode
    for REAL; heavyweight formats STUB behind import-try."""
    if payload[:4] == MAGIC:
        kind = payload[4:5].decode()
        h, w, c = struct.unpack("<HHB", payload[5:10])
        if kind == "I":
            return "image", np.frombuffer(payload[10:], np.uint8).reshape(h, w, c)
        if kind == "A":
            return "audio", np.frombuffer(payload[10:], np.int16)
        if kind == "V":
            (f,) = struct.unpack("<H", payload[10:12])
            return "video", np.frombuffer(payload[12:], np.uint8).reshape(f, h, w)
        raise ValueError(f"unknown fake kind {kind!r}")
    # real formats: gate on the actual libraries
    if payload[:2] == b"\xff\xd8":  # JPEG
        try:
            import io

            import PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                "real JPEG decode requires PIL (not in this container)"
            ) from e
        return "image", np.asarray(PIL.Image.open(io.BytesIO(payload)))
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":  # real WAV
        return _decode_wav(payload)
    if payload[:2] in (b"P6", b"P5"):  # real binary PPM/PGM
        return _decode_ppm(payload)
    raise ValueError("unrecognized payload format")


def fixtures_media_table(n: int, start: int = 0) -> pa.Table:
    """Deterministic mixed-modality table:
    media_id:int64, kind:string, payload:binary, width/height/frames
    metadata columns (typed metadata beside the opaque binary)."""
    ids, kinds, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(start, start + n):
        ids.append(i)
        m = i % 3
        if m == 0:
            h, w = 8 + i % 5, 6 + i % 4
            payloads.append(encode_fake_image(i, h, w))
            kinds.append("image"); ws.append(w); hs.append(h); fs.append(0)
        elif m == 1:
            ns = 256 + (i % 7) * 32
            payloads.append(encode_fake_audio(i, ns))
            kinds.append("audio"); ws.append(0); hs.append(0); fs.append(0)
        else:
            f, h, w = 4 + i % 3, 6, 5
            payloads.append(encode_fake_video(i, f, h, w))
            kinds.append("video"); ws.append(w); hs.append(h); fs.append(f)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "frames": pa.array(fs, pa.int32()),
        }
    )


def dhash64(img: np.ndarray) -> int:
    """Perceptual difference-hash of an image: nearest-neighbor resize
    to 9×8 grayscale, one bit per horizontal gradient sign → 64-bit
    hash.  Robust to uniform brightness/contrast shifts (monotone maps
    preserve the > comparisons) — the standard cheap near-dup signature
    for crawl images."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    img = img.astype(np.float64)
    h, w = img.shape
    yi = (np.arange(8) * h // 8).astype(np.int64)
    xi = (np.arange(9) * w // 9).astype(np.int64)
    g = img[yi][:, xi]
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    return int(
        np.sum(bits.astype(np.uint64) << np.arange(64, dtype=np.uint64))
    )


def video_signature64(frames: np.ndarray, frame_stride: int = 2) -> int:
    """Temporal near-dup signature of a video: sample every
    ``frame_stride``-th frame (the frame-sample stage), dhash64 each,
    then per-bit MAJORITY across the sampled frame hashes (strict —
    ties fall to 0).  Brightness/contrast shifts leave every per-frame
    dHash unchanged (monotone-map invariance), and an edit to one frame
    can only move bits whose cross-frame vote was pivotal, so the fold
    absorbs single-frame perturbations — the video analog of dhash64's
    role for crawl images."""
    step = max(1, int(frame_stride))
    sampled = frames[::step]
    hs = np.asarray([dhash64(f) for f in sampled], dtype=np.uint64)
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    maj = bits.sum(axis=0) * 2 > len(hs)
    return int(np.sum(maj.astype(np.uint64) << np.arange(64, dtype=np.uint64)))


def audio_fingerprint64(samples: np.ndarray, n_frames: int = 17, n_bands: int = 4) -> int:
    """MFCC-lite fingerprint of a PCM clip: frame → |rfft| → band
    log-energies → one bit per (frame-delta × band) energy-increase sign
    (the Haitsma-Kalker / Shazam-style sign-of-delta hash).  Invariant
    to uniform gain (log energies shift equally; deltas cancel).
    Uses the first ``n_frames`` frames × ``n_bands`` bands = 64 bits."""
    x = samples.astype(np.float64)
    frame, hop = 256, 128
    need = frame + hop * (n_frames - 1)
    if len(x) < need:  # loop-pad short clips deterministically
        x = np.resize(x, need)
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * np.hanning(frame)[None, :], axis=1))
    nb = spec.shape[1] // n_bands
    bands = spec[:, : nb * n_bands].reshape(n_frames, n_bands, nb).sum(axis=2)
    loge = np.log(bands + 1e-9)
    bits = (loge[1:] - loge[:-1] > 0).reshape(-1)[:64]
    return int(
        np.sum(bits.astype(np.uint64) << np.arange(len(bits), dtype=np.uint64))
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode + per-modality features.

    Constructor does the once-per-actor setup (codec registry, resize
    kernel); __call__ handles one bounded batch — binary rows are wide,
    so callers pass a small ``batch_size`` (map_batches(…, batch_size=32,
    concurrency=(1, N), num_cpus=1))."""

    def __init__(self, resize_to: tuple[int, int] = (4, 4), frame_stride: int = 2):
        self.resize_to = resize_to
        self.frame_stride = frame_stride

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize (deterministic, library-free)."""
        th, tw = self.resize_to
        h, w = img.shape[:2]
        yi = (np.arange(th) * h // th).astype(np.int64)
        xi = (np.arange(tw) * w // tw).astype(np.int64)
        return img[yi][:, xi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "kind": [], "n_bytes": [], "feat_dim": [],
            "mean_value": [], "resized": [], "n_frames_sampled": [],
        }
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            kind, arr = decode_payload(payload)
            out["media_id"].append(mid)
            out["kind"].append(kind)
            out["n_bytes"].append(len(payload))
            if kind == "image":
                r = self._resize(arr)
                out["feat_dim"].append(int(r.size))
                out["mean_value"].append(round(float(arr.mean()), 6))
                out["resized"].append(r.astype(np.float32).reshape(-1).tolist())
                out["n_frames_sampled"].append(0)
            elif kind == "audio":
                out["feat_dim"].append(int(arr.size))
                out["mean_value"].append(round(float(np.abs(arr).mean()), 6))
                out["resized"].append([])
                out["n_frames_sampled"].append(0)
            else:  # video: frame-sample then per-frame mean
                frames = arr[:: self.frame_stride]
                out["feat_dim"].append(int(frames.shape[0]))
                out["mean_value"].append(round(float(frames.mean()), 6))
                out["resized"].append(
                    [round(float(f.mean()), 6) for f in frames]
                )
                out["n_frames_sampled"].append(int(frames.shape[0]))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "kind": pa.array(out["kind"], pa.string()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "feat_dim": pa.array(out["feat_dim"], pa.int64()),
                "mean_value": pa.array(out["mean_value"], pa.float64()),
                "resized": pa.array(out["resized"], pa.list_(pa.float32())),
                "n_frames_sampled": pa.array(
                    out["n_frames_sampled"], pa.int64()
                ),
            }
        )
