"""Sketch math: merge exactness/associativity vs numpy ground truth."""

import numpy as np
import pytest

from anomaly_detection_spark.sketches import (
    BloomFilter,
    TDigest,
    welford_finalize,
    welford_merge,
    welford_update_batch,
    welford_zero,
)


def test_welford_matches_numpy_and_merge_is_associative():
    rng = np.random.default_rng(7)
    data = rng.normal(10.0, 3.0, size=10_001)
    # fold in uneven batches
    chunks = np.split(data, [17, 400, 401, 5000, 9999])
    states = [welford_update_batch(welford_zero(), c) for c in chunks]
    left = states[0]
    for s in states[1:]:
        left = welford_merge(left, s)
    right = states[-1]
    for s in reversed(states[:-1]):
        right = welford_merge(s, right)
    for st in (left, right):
        n, mean, var_pop, var_samp = welford_finalize(st)
        assert n == len(data)
        assert mean == pytest.approx(data.mean(), rel=1e-12)
        assert var_pop == pytest.approx(data.var(), rel=1e-9)
        assert var_samp == pytest.approx(data.var(ddof=1), rel=1e-9)


def test_welford_nan_and_empty():
    st = welford_update_batch(welford_zero(), np.array([np.nan, 1.0, 3.0]))
    n, mean, _, _ = welford_finalize(st)
    assert n == 2 and mean == 2.0
    assert welford_merge(welford_zero(), st) == st


def test_tdigest_quantiles_close_to_exact():
    rng = np.random.default_rng(0)
    data = rng.lognormal(3.0, 1.0, size=50_000)
    # distributed-style: 8 partition digests merged
    parts = np.array_split(data, 8)
    d = TDigest(200)
    for p in parts:
        d = d.merge(TDigest.from_values(p, 200))
    assert len(d.means) < 500  # actually compressed
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        exact = np.quantile(data, q)
        got = d.quantile(q)
        assert got == pytest.approx(exact, rel=0.05), q


def test_tdigest_cdf_roundtrip():
    data = np.arange(10_000, dtype=float)
    d = TDigest.from_values(data)
    for q in (0.1, 0.5, 0.9):
        x = d.quantile(q)
        assert d.cdf(x) == pytest.approx(q, abs=0.02)
    assert d.cdf(-1.0) == 0.0 and d.cdf(1e9) == 1.0


def test_bloom_no_false_negatives_and_low_fp():
    keys = [f"key-{i}" for i in range(5_000)]
    bf = BloomFilter.sized_for(5_000, fpp=0.01)
    # distributed-style: two partial filters OR-merged
    a = BloomFilter(bf.m_bits, bf.k)
    b = BloomFilter(bf.m_bits, bf.k)
    a.add_batch(np.array(keys[:2500]))
    b.add_batch(np.array(keys[2500:]))
    merged = a.merge(b)
    assert merged.contains_batch(np.array(keys)).all()  # zero false negatives
    probe = np.array([f"absent-{i}" for i in range(10_000)])
    fp_rate = merged.contains_batch(probe).mean()
    assert fp_rate < 0.03
    # serialization roundtrip
    back = BloomFilter.from_bytes(merged.m_bits, merged.k, merged.to_bytes())
    assert back.contains_batch(np.array(keys[:100])).all()


def test_hll_accuracy_and_merge():
    from anomaly_detection_spark.sketches import HyperLogLog

    a = HyperLogLog(12)
    b = HyperLogLog(12)
    a.add_batch(np.array([f"x{i}" for i in range(60_000)]))
    b.add_batch(np.array([f"x{i}" for i in range(30_000, 90_000)]))  # overlap
    merged = a.merge(b)
    est = merged.estimate()
    assert abs(est - 90_000) / 90_000 < 0.05
    # merge == single-pass build
    c = HyperLogLog(12).add_batch(np.array([f"x{i}" for i in range(90_000)]))
    assert abs(merged.estimate() - c.estimate()) / c.estimate() < 0.03
    # serialization roundtrip
    back = HyperLogLog.from_bytes(12, merged.to_bytes())
    assert back.estimate() == merged.estimate()


def test_hll_small_range():
    from anomaly_detection_spark.sketches import HyperLogLog

    h = HyperLogLog(12).add_batch(np.array(["a", "b", "c", "a"]))
    assert abs(h.estimate() - 3) < 0.5
