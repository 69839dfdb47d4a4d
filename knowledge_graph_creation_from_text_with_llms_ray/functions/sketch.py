"""HyperLogLog sketch kernels (deterministic, oracle-replicable).

The 100-TB reporting path for distinct counts: instead of an exact
single-column shuffle (``relational.distinct``), every block reduces to
at most 2^p (bucket, rho) register partials that merge with ``max`` —
an associative, skew-immune combine whose total shuffle volume is
O(2^p × blocks) regardless of row count or key skew.

Determinism: the 64-bit value hash is splitmix64 (no seed, wraparound
arithmetic only), so sketches are byte-identical across runs, block
layouts and cluster sizes — AND expressible in DuckDB HUGEINT
arithmetic, which lets the correctness oracle verify the full register
set value-exactly (the float *estimate* is derived driver-side and
gated by tests instead; see ``hll_estimate``).
"""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 4096 registers; σ ≈ 1.04/√4096 ≈ 1.6 %

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer over uint64 (wraparound multiplies)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * _C1
    x = (x ^ (x >> np.uint64(27))) * _C2
    return x ^ (x >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = HLL_P) -> tuple[np.ndarray, np.ndarray]:
    """(buckets, rhos) register partials for a batch of int64 values:
    bucket = top ``p`` hash bits, rho = leading-zero count of the
    remaining ``64-p`` bits + 1.  Returns per-bucket MAX rho, deduped —
    at most 2^p rows regardless of batch size."""
    h = splitmix64(values.astype(np.uint64))
    buckets = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # bit length via frexp exponent (exact: w < 2^52 for p ≥ 12)
    exp = np.frexp(w.astype(np.float64))[1]
    rho = np.where(w == 0, 64 - p + 1, (64 - p) + 1 - exp).astype(np.int64)
    # per-bucket max
    order = np.lexsort((rho, buckets))
    b_s, r_s = buckets[order], rho[order]
    last = np.r_[b_s[1:] != b_s[:-1], True]
    return b_s[last], r_s[last]


def hll_estimate(buckets: np.ndarray, rhos: np.ndarray, p: int = HLL_P) -> float:
    """Bias-corrected HLL estimate from a (possibly sparse) register
    set — absent buckets count as register 0."""
    m = 1 << p
    registers = np.zeros(m, dtype=np.int64)
    registers[buckets] = rhos
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if raw <= 2.5 * m and zeros > 0:  # small-range correction
        return float(m * np.log(m / zeros))
    return float(raw)
