"""Mergeable sketches — the engine's distributed-aggregation primitives.

PySpark has no public vectorized UDAF with a ``merge`` phase, so every
sketch here follows the same explicit contract the reference's stateful
scorers implied (zero / update / merge / finalize), executed as:

    mapInPandas(update over Arrow batches)  ->  per-partition partial rows
    groupBy(...).applyInPandas(merge)       ->  merged sketch / final stats

All update/merge math is whole-batch numpy — zero per-row Python (north
rule). Each sketch's merge is associative + commutative and is tested for
exactness/monotonicity in tests/test_sketches.py.

Sketches:
  * Welford moments (count, mean, M2) — parallel merge via Chan's update;
    the distributed generalization of the reference's online Welford
    recurrence (/root/reference/src/algorithms/welford.py:176-191).
  * t-digest (merging variant, Dunning & Ertl) — quantiles for the drift
    checks (KS on sketches) without collecting data.
  * Bloom filter (numpy bitset) — broadcastable pre-filter for
    referential checks; OR-merge.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# Welford / Chan moments
# ---------------------------------------------------------------------------

def welford_zero() -> tuple[float, float, float]:
    return (0.0, 0.0, 0.0)


def welford_update_batch(state, values: np.ndarray):
    """Fold a whole batch into (count, mean, M2) by computing the batch's
    exact moments vectorized, then merging — O(1) scalar work per batch."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if v.size == 0:
        return state
    bn = float(v.size)
    bmean = float(v.mean())
    bM2 = float(((v - bmean) ** 2).sum())
    return welford_merge(state, (bn, bmean, bM2))


def welford_merge(a, b):
    """Chan's parallel update: exact, associative merge of two moment sets."""
    na, ma, M2a = a
    nb, mb, M2b = b
    if na == 0.0:
        return b
    if nb == 0.0:
        return a
    n = na + nb
    delta = mb - ma
    mean = ma + delta * nb / n
    M2 = M2a + M2b + delta * delta * na * nb / n
    return (n, mean, M2)


def welford_finalize(state):
    """-> (count, mean, variance_pop, variance_samp)."""
    n, mean, M2 = state
    if n == 0:
        return (0.0, float("nan"), float("nan"), float("nan"))
    var_pop = M2 / n
    var_samp = M2 / (n - 1) if n > 1 else float("nan")
    return (n, mean, var_pop, var_samp)


# ---------------------------------------------------------------------------
# t-digest (merging variant; Dunning & Ertl, "Computing extremely accurate
# quantiles using t-digests", arXiv:1902.04023 — public algorithm)
# ---------------------------------------------------------------------------

class TDigest:
    """Compact mergeable quantile sketch. Centroids kept as parallel numpy
    arrays (mean, weight), compressed with the k1 scale function.

    Serialization: ``to_arrays`` -> (means, weights) float64 arrays, so a
    digest rides through Arrow as two list<double> columns.
    """

    __slots__ = ("delta", "means", "weights", "_min", "_max")

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._min = math.inf
        self._max = -math.inf

    # -- construction ------------------------------------------------------
    @classmethod
    def from_values(cls, values: np.ndarray, delta: int = 200) -> "TDigest":
        d = cls(delta)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            d.means = np.sort(v)
            d.weights = np.ones_like(d.means)
            d._min = float(d.means[0])
            d._max = float(d.means[-1])
            d._compress()
        return d

    @classmethod
    def from_arrays(cls, means, weights, delta: int = 200) -> "TDigest":
        d = cls(delta)
        d.means = np.asarray(means, dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        if d.means.size:
            d._min = float(d.means.min())
            d._max = float(d.means.max())
        return d

    def to_arrays(self):
        return self.means, self.weights

    # -- merge -------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(self.delta)
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(means, kind="mergesort")
        out.means, out.weights = means[order], weights[order]
        out._min = min(self._min, other._min)
        out._max = max(self._max, other._max)
        out._compress()
        return out

    # -- compression (k1 scale: k(q) = delta/(2*pi) * asin(2q-1)) ----------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2.0 * math.pi) * np.arcsin(2.0 * np.clip(q, 0, 1) - 1.0)

    def _compress(self):
        if self.means.size <= 1:
            return
        total = self.weights.sum()
        new_means: list[float] = []
        new_weights: list[float] = []
        cum = 0.0
        cur_m, cur_w = self.means[0], self.weights[0]
        for m, w in zip(self.means[1:], self.weights[1:]):
            q0 = cum / total
            q1 = (cum + cur_w + w) / total
            if self._k(np.array([q1]))[0] - self._k(np.array([q0]))[0] <= 1.0:
                # merge into current centroid (weighted mean)
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                new_means.append(cur_m)
                new_weights.append(cur_w)
                cum += cur_w
                cur_m, cur_w = m, w
        new_means.append(cur_m)
        new_weights.append(cur_w)
        self.means = np.array(new_means)
        self.weights = np.array(new_weights)

    # -- queries -----------------------------------------------------------
    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid cumulative midpoints
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return self._min if q <= 0 else float(
                self._min + (self.means[0] - self._min) * target / max(cum[0], 1e-12)
            )
        if target >= cum[-1]:
            rem = total - cum[-1]
            return self._max if q >= 1 else float(
                self.means[-1] + (self._max - self.means[-1])
                * (target - cum[-1]) / max(rem, 1e-12)
            )
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def cdf(self, x: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if x <= self._min:
            return 0.0
        if x >= self._max:
            return 1.0
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        i = int(np.searchsorted(self.means, x))
        if i == 0:
            return float(cum[0] * (x - self._min) / max(self.means[0] - self._min, 1e-12) / total)
        if i >= self.means.size:
            return float((cum[-1] + (total - cum[-1]) * (x - self.means[-1])
                          / max(self._max - self.means[-1], 1e-12)) / total)
        frac = (x - self.means[i - 1]) / max(self.means[i] - self.means[i - 1], 1e-12)
        return float((cum[i - 1] + frac * (cum[i] - cum[i - 1])) / total)


# ---------------------------------------------------------------------------
# Bloom filter (split-less simple bitset; k hashes from two 64-bit hashes —
# Kirsch–Mitzenmacher double hashing, public construction)
# ---------------------------------------------------------------------------

class BloomFilter:
    __slots__ = ("m_bits", "k", "bits")

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(
            (m_bits + 63) // 64, dtype=np.uint64
        )

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "BloomFilter":
        m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, int(round(m / max(n_items, 1) * math.log(2))))
        return cls(m, min(k, 16))

    @staticmethod
    def _hash2(values) -> tuple[np.ndarray, np.ndarray]:
        """Two vectorized 64-bit hashes per value (FNV-1a over utf-8 bytes
        with two different offsets), computed whole-array in numpy."""
        import pandas as pd

        s = pd.Series(values).astype(str)
        h1 = pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)
        # second independent hash: splitmix64 finalizer of h1
        z = (h1 + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = z ^ (z >> np.uint64(31))
        return h1, h2

    def add_batch(self, values):
        h1, h2 = self._hash2(values)
        m = np.uint64(self.m_bits)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % m
            word, bit = idx >> np.uint64(6), idx & np.uint64(63)
            np.bitwise_or.at(self.bits, word.astype(np.int64),
                             np.uint64(1) << bit)

    def contains_batch(self, values) -> np.ndarray:
        h1, h2 = self._hash2(values)
        m = np.uint64(self.m_bits)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % m
            word, bit = idx >> np.uint64(6), idx & np.uint64(63)
            out &= (self.bits[word.astype(np.int64)]
                    & (np.uint64(1) << bit)) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m_bits == other.m_bits and self.k == other.k
        return BloomFilter(self.m_bits, self.k, self.bits | other.bits)

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, m_bits: int, k: int, raw: bytes) -> "BloomFilter":
        return cls(m_bits, k, np.frombuffer(raw, dtype=np.uint64).copy())


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, with the standard small-range
# correction — public algorithm). Registers are a numpy uint8 array;
# merge = element-wise max. Complements Spark's built-in
# approx_count_distinct (HLL++) when the per-partition sketch OBJECT
# must be stored (audit table) or merged across runs.
# ---------------------------------------------------------------------------

class HyperLogLog:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_batch(self, values) -> "HyperLogLog":
        import pandas as pd

        h = pd.util.hash_pandas_object(
            pd.Series(values).astype(str), index=False
        ).to_numpy().astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = position of first set bit in the remaining bits (1-based),
        # computed vectorized via float64 log2 of the left-aligned value
        rank = np.where(
            rest == 0, 64 - self.p + 1,
            (64 - np.floor(np.log2(rest.astype(np.float64) + 0.5)) - 1 + 1)
        ).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -self.registers.astype(np.float64)).sum()
        if est <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * math.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, p: int, raw: bytes) -> "HyperLogLog":
        return cls(p, np.frombuffer(raw, dtype=np.uint8).copy())
