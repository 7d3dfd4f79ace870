"""Property-based tests (hypothesis) for the pure-python kernels — merge
associativity/commutativity, estimator bounds, ladder semantics. The
reference has no property tests at all (SURVEY.md §5.1); these pin the
algebraic laws the distributed execution RELIES on: any partitioning of
the data must produce the same merged sketch."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_spark.sketches import (
    BloomFilter,
    HyperLogLog,
    TDigest,
    welford_finalize,
    welford_merge,
    welford_update_batch,
    welford_zero,
)

finite = st.floats(min_value=-1e9, max_value=1e9,
                   allow_nan=False, allow_infinity=False)
batches = st.lists(st.lists(finite, min_size=0, max_size=40),
                   min_size=1, max_size=6)


@settings(max_examples=60, deadline=None)
@given(batches)
def test_welford_any_partitioning_same_result(parts):
    """Merging per-batch moments in ANY grouping equals the single pass."""
    flat = [v for p in parts for v in p]
    single = welford_update_batch(welford_zero(), np.array(flat))
    # left fold
    left = welford_zero()
    for p in parts:
        left = welford_merge(left, welford_update_batch(welford_zero(), np.array(p)))
    # pairwise tree fold
    states = [welford_update_batch(welford_zero(), np.array(p)) for p in parts]
    while len(states) > 1:
        states = [welford_merge(states[i], states[i + 1])
                  if i + 1 < len(states) else states[i]
                  for i in range(0, len(states), 2)]
    for st_ in (left, states[0]):
        n1, m1, v1, _ = welford_finalize(single)
        n2, m2, v2, _ = welford_finalize(st_)
        assert n1 == n2
        if n1 > 0:
            assert math.isclose(m1, m2, rel_tol=1e-9, abs_tol=1e-6)
            assert math.isclose(v1, v2, rel_tol=1e-6, abs_tol=1e-4)


@settings(max_examples=30, deadline=None)
@given(st.lists(finite, min_size=1, max_size=500),
       st.floats(min_value=0.01, max_value=0.99))
def test_tdigest_quantile_within_data_range(values, q):
    d = TDigest.from_values(np.array(values))
    got = d.quantile(q)
    assert min(values) - 1e-9 <= got <= max(values) + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.lists(finite, min_size=1, max_size=200),
                min_size=2, max_size=4))
def test_tdigest_merge_commutative_median_stability(parts):
    arrays = [np.array(p) for p in parts]
    ab = TDigest(100)
    for a in arrays:
        ab = ab.merge(TDigest.from_values(a, 100))
    ba = TDigest(100)
    for a in reversed(arrays):
        ba = ba.merge(TDigest.from_values(a, 100))
    flat = np.concatenate(arrays)
    exact = float(np.quantile(flat, 0.5))
    span = float(flat.max() - flat.min()) or 1.0
    assert abs(ab.quantile(0.5) - exact) <= 0.25 * span + 1e-6
    assert abs(ba.quantile(0.5) - exact) <= 0.25 * span + 1e-6


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=200))
def test_bloom_never_false_negative(keys):
    bf = BloomFilter.sized_for(len(keys), 0.01)
    bf.add_batch(np.array(keys, dtype=object))
    assert bf.contains_batch(np.array(keys, dtype=object)).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=300),
       st.integers(min_value=1, max_value=4))
def test_hll_split_merge_equals_single_pass(keys, n_parts):
    whole = HyperLogLog(10)
    whole.add_batch(np.array(keys, dtype=object))
    merged = HyperLogLog(10)
    for part in np.array_split(np.array(keys, dtype=object), n_parts):
        h = HyperLogLog(10)
        if len(part):
            h.add_batch(part)
        merged = merged.merge(h)
    assert (merged.registers == whole.registers).all()


@settings(max_examples=60, deadline=None)
@given(finite, st.lists(st.floats(min_value=0.01, max_value=0.99),
                        min_size=0, max_size=3))
def test_ladder_numpy_matches_reference_semantics(vn, stages):
    """The vectorized ladder equals the reference's ascending-loop rule:
    error outside [-1,1]; else warning iff ANY stage s has vn>s or
    vn<-s; else OK."""
    from anomaly_detection_spark.operators.sequential import _ladder_codes_np

    got = _ladder_codes_np(np.array([vn]), tuple(stages))[0]
    if vn > 1.0 or vn < -1.0:
        want = -1
    elif any(vn > s or vn < -s for s in stages):
        want = 0
    else:
        want = 1
    assert got == want
