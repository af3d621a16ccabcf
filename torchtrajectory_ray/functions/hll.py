"""HyperLogLog cardinality sketch (Flajolet, Fusy, Gandouet, Meunier,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007 — public).

The 100-TB path for COUNT(DISTINCT): per-batch register partials are a
FIXED 2^p bytes regardless of batch cardinality, merge is an
element-wise ``max`` (associative + commutative + idempotent, so the
estimate is independent of batch boundaries, parallelism, and retries),
and the driver fold is O(blocks × groups × 2^p) bytes — never
vocabulary-sized.  The exact counterpart (``textstats.distinct_terms``)
ships distinct pairs through a vocabulary-sized shuffle; this sketch is
what replaces it when the vocabulary itself no longer fits a shuffle.

Hashes come from the engine's own 63-bit blake2b ``term_hash`` — fully
deterministic, so the estimate is a pure function of the distinct-value
SET (asserted by the merge/permutation tests).
"""

from __future__ import annotations

import numpy as np

DEFAULT_P = 12  # 4096 registers: rel. std error 1.04/sqrt(m) ~= 1.6 %
_HASH_BITS = 63  # term_hash is 63-bit positive


def _check_p(p: int) -> None:
    """The frexp bit-length trick below is only exact while the hash
    suffix fits float64's 53-bit mantissa (63-p <= 53 → p >= 10); for
    smaller p a suffix just below a power of two rounds UP and
    overstates the bit length (rho as low as 0), biasing the estimate
    and corrupting the regs==0 linear-counting branch."""
    if not 10 <= p <= 18:
        raise ValueError(f"hll: p must be in [10, 18] (got {p}); p<10 breaks the exact float64 bit-length computation")


def hll_init(p: int = DEFAULT_P) -> np.ndarray:
    _check_p(p)
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(regs: np.ndarray, hashes: np.ndarray) -> None:
    """Fold 63-bit hashes into the registers in place (vectorized).

    Register index = low ``p`` bits; rho = position of the highest set
    bit in the remaining ``63-p`` bits, counted from the top (all-zero
    suffix → rho = 64-p, the standard convention).
    """
    if hashes.size == 0:
        return
    p = int(np.log2(regs.size))
    _check_p(p)
    h = hashes.astype(np.uint64)
    idx = (h & np.uint64(regs.size - 1)).astype(np.int64)
    w = h >> np.uint64(p)  # 63-p significant bits
    suffix_bits = _HASH_BITS - p
    # bit_length via frexp: w < 2^53 converts to float64 exactly and
    # frexp returns the EXACT binary exponent (value = m·2^e, 0.5<=m<1,
    # so e == bit_length).  floor(log2(w)) is NOT safe here — for w just
    # below 2^k (k >= 49) log2 rounds up to k and overstates the length.
    bl = np.zeros(w.size, dtype=np.int64)
    nz = w > 0
    bl[nz] = np.frexp(w[nz].astype(np.float64))[1].astype(np.int64)
    rho = (suffix_bits - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if a.size != b.size:
        raise ValueError(f"hll_merge: register sizes differ ({a.size} vs {b.size})")
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected estimate with the standard small-range linear
    counting correction (the large-range correction is unnecessary for a
    63-bit hash space)."""
    m = float(regs.size)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if est <= 2.5 * m:
        v = int(np.count_nonzero(regs == 0))
        if v:
            est = m * np.log(m / v)
    return float(est)
