"""Vectorized Bloom filter over int64 keys — the broadcast prefilter
for distributed semi-joins.

At 100 TB the build side of a semi-join (e.g. "customers in region X")
can be far too large to broadcast as an exact key set, but a Bloom
filter at ~10 bits/key is 1/6th the size of the raw int64 keys and
prunes the probe side to (true matches + ε false positives) BEFORE the
exchange; the exact verify then happens co-partitioned, where each
partition holds both its keys and its surviving probes.  One-sided
error (never drops a true member) keeps the join exact.

All operations are numpy-vectorized: double hashing h_i = h1 + i·h2
(Kirsch & Mitzenmacher 2006) from a splitmix64 finalizer, bit array as
uint64 words.  Public-domain algorithms only; no reference-code
derivation (the reference has no bloom component — this is the scale
path its broadcast id-set loads, e.g. J2's whole-map broadcast, grow
into)."""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_FIB = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele et al.) — uint64 in,
    well-mixed uint64 out; numpy unsigned arithmetic wraps mod 2^64."""
    x = (x + _FIB).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


def bloom_params(n_keys: int, bits_per_key: int = 10) -> tuple[int, int]:
    """(m_bits rounded up to a word multiple, k hash count ≈ m/n·ln2)."""
    m = max(64, int(n_keys) * int(bits_per_key))
    m = (m + 63) // 64 * 64
    k = max(1, int(round(m / max(1, n_keys) * 0.6931471805599453)))
    return m, min(k, 16)


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) array of bit positions via double hashing; h2 forced odd
    so the stride cycles the full (power-of-two-free) range."""
    u = keys.astype(np.uint64)
    h1 = _mix64(u)
    h2 = _mix64(u ^ _FIB) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(
        np.uint64
    )


def bloom_zero(m_bits: int) -> np.ndarray:
    return np.zeros(m_bits // 64, np.uint64)


def bloom_add(words: np.ndarray, keys: np.ndarray, k: int) -> None:
    """Set the k bits of every key (in place) — one np.bitwise_or.at."""
    if len(keys) == 0:
        return
    pos = _positions(np.asarray(keys), len(words) * 64, k).ravel()
    np.bitwise_or.at(
        words, (pos >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (pos & np.uint64(63)),
    )


def bloom_test(words: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership mask — True for every inserted key (no false
    negatives), True with probability ≈(1−e^{−kn/m})^k for others."""
    keys = np.asarray(keys)
    if len(keys) == 0:
        return np.zeros(0, bool)
    pos = _positions(keys, len(words) * 64, k)
    hit = (
        words[(pos >> np.uint64(6)).astype(np.int64)]
        >> (pos & np.uint64(63))
    ) & np.uint64(1)
    return hit.all(axis=0)


def bloom_or(parts: list[np.ndarray]) -> np.ndarray:
    """Fold per-batch partial filters (same params) into one."""
    out = parts[0].copy()
    for p in parts[1:]:
        out |= p
    return out
