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


# ---------------------------------------------------------------------------
# t-digest-style quantile sketch (simplified uniform-budget merging digest)
# ---------------------------------------------------------------------------

TDIGEST_DELTA = 200  # target centroid count; mid-quantile rank error ~1/delta


def tdigest_compress(
    means: np.ndarray, counts: np.ndarray, delta: int = TDIGEST_DELTA
) -> tuple[np.ndarray, np.ndarray]:
    """Merge weighted points/centroids into ≤ ~delta centroids: sort by
    mean, greedily fuse neighbors while a centroid's weight stays under
    ``total/delta``.  Deterministic for a given input multiset order
    (stable sort); associative enough for tree merging — each level's
    output is again (mean, count) rows.  Uniform weight budget (not the
    tail-tapered k-scale of the t-digest paper) ⇒ rank error ~1/delta
    uniformly, which the accuracy tests pin."""
    if len(means) == 0:
        return means.astype(np.float64), counts.astype(np.int64)
    order = np.argsort(means, kind="stable")
    means = np.asarray(means, dtype=np.float64)[order]
    counts = np.asarray(counts, dtype=np.int64)[order]
    total = int(counts.sum())
    budget = max(1.0, total / float(delta))
    out_m: list[float] = []
    out_c: list[int] = []
    cur_m, cur_c = float(means[0]), int(counts[0])
    for m, c in zip(means[1:], counts[1:]):
        c = int(c)
        if cur_c + c <= budget:
            cur_m = (cur_m * cur_c + float(m) * c) / (cur_c + c)
            cur_c += c
        else:
            out_m.append(cur_m)
            out_c.append(cur_c)
            cur_m, cur_c = float(m), c
    out_m.append(cur_m)
    out_c.append(cur_c)
    return np.asarray(out_m, dtype=np.float64), np.asarray(out_c, dtype=np.int64)


def tdigest_quantiles(
    means: np.ndarray, counts: np.ndarray, qs: list[float]
) -> list[float]:
    """Quantile estimates from a final centroid set: midpoint
    cumulative ranks + linear interpolation between centroid means."""
    order = np.argsort(means, kind="stable")
    m = np.asarray(means, dtype=np.float64)[order]
    c = np.asarray(counts, dtype=np.float64)[order]
    total = c.sum()
    if total == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(c) - c / 2.0
    out = []
    for q in qs:
        rank = q * total
        out.append(float(np.interp(rank, cum, m)))
    return out
