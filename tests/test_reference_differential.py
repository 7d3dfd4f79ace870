"""Differential parity: run the ACTUAL reference detectors (imported from
/root/reference/src with messaging/plotting deps stubbed) and this
engine's operators on the same seeded series; status_code sequences must
match element-wise — the north rule's row-for-row flagged-record parity,
executed against the reference implementation itself rather than a
re-derived oracle.

Skipped when /root/reference is not present (the repo stays standalone).
"""

import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import codes_of, series_df

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src", "algorithms")),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference detectors with kafka/influx/matplotlib stubbed."""
    stubs = {}
    for name in ["kafka", "influxdb_client", "influxdb_client.client",
                 "influxdb_client.client.write_api", "matplotlib",
                 "matplotlib.pyplot", "requests",
                 # only needed so combination.py's transitive imports of
                 # Filtering/IsolationForest/PCA resolve at import time
                 "scipy", "scipy.signal", "sklearn", "sklearn.ensemble",
                 "sklearn.decomposition"]:
        mod = types.ModuleType(name)
        stubs[name] = mod
    stubs["kafka"].KafkaProducer = object
    stubs["influxdb_client"].InfluxDBClient = object
    stubs["influxdb_client.client.write_api"].SYNCHRONOUS = None
    stubs["influxdb_client.client.write_api"].ASYNCHRONOUS = None

    class _AnyAttr:
        def __getattr__(self, _):
            return _AnyAttr()

        def __call__(self, *a, **k):
            return _AnyAttr()

    stubs["matplotlib.pyplot"].style = _AnyAttr()
    stubs["matplotlib"].pyplot = stubs["matplotlib.pyplot"]
    saved = {}
    for name, mod in stubs.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        from algorithms.border_check import BorderCheck
        from algorithms.combination import AND, OR, Combination, PercentScore
        from algorithms.cumulative import Cumulative
        from algorithms.ema import EMA
        from algorithms.macd import MACD
        from algorithms.welford import Welford
        yield {
            "BorderCheck": BorderCheck, "EMA": EMA, "Welford": Welford,
            "MACD": MACD, "Cumulative": Cumulative,
            "Combination": Combination, "AND": AND, "OR": OR,
            "PercentScore": PercentScore,
        }
    finally:
        sys.path.remove(os.path.join(REF, "src"))
        for name, m in saved.items():
            if m is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = m


def run_reference(det_cls, conf: dict, values, start_ts=1459926000.0,
                  step=3600.0):
    det = det_cls()
    base = {"input_vector_size": 1, "output": [], "output_conf": [{}],
            "filtering": "None"}
    base.update(conf)
    det.configure(base)
    codes = []
    for i, v in enumerate(values):
        ret = det.message_insert({"ftr_vector": [float(v)],
                                  "timestamp": start_ts + i * step})
        # most detectors store self.status_code; Hampel only RETURNS it
        if isinstance(ret, tuple) and len(ret) == 2:
            codes.append(ret[1])
        else:
            codes.append(getattr(det, "status_code", 2))
    return codes


@pytest.fixture(scope="module")
def series():
    rng = np.random.default_rng(42)
    walk = np.cumsum(rng.normal(0, 1, 120)) + 10.0
    walk[40] += 25.0   # spike
    walk[80] -= 25.0   # dip
    return [float(v) for v in walk]


def test_border_check_differential(spark, ref_modules, series):
    conf = {"UL": 20.0, "LL": -5.0, "warning_stages": [0.7, 0.9]}
    ref = run_reference(ref_modules["BorderCheck"], conf, series)

    from anomaly_detection_spark.codes import ladder_code, normalized
    from pyspark.sql import functions as F

    df = series_df(spark, series)
    got = codes_of(df.withColumn(
        "code", ladder_code(normalized(F.col("value"), -5.0, 20.0),
                            (0.7, 0.9))))
    assert got == ref


def test_welford_windowed_differential(spark, ref_modules, series):
    conf = {"N": 10, "X": 2.0, "warning_stages": [0.8]}
    ref = run_reference(ref_modules["Welford"], conf, series)

    from anomaly_detection_spark.operators.windowed import welford_windowed

    df = series_df(spark, series)
    got = codes_of(welford_windowed(df, "series", "ts", "value", N=10,
                                    X=2.0, warning_stages=(0.8,)))
    assert got == ref


def test_welford_streaming_differential(spark, ref_modules, series):
    conf = {"X": 2.5, "warning_stages": []}
    ref = run_reference(ref_modules["Welford"], conf, series)

    from anomaly_detection_spark.operators.windowed import welford_streaming

    df = series_df(spark, series)
    got = codes_of(welford_streaming(df, "series", "ts", "value", X=2.5))
    assert got == ref


def test_ema_differential(spark, ref_modules, series):
    conf = {"N": 5, "UL": 15.0, "LL": -5.0, "warning_stages": [0.9]}
    ref = run_reference(ref_modules["EMA"], conf, series)

    from anomaly_detection_spark.operators.sequential import ema_check

    df = series_df(spark, series)
    got = codes_of(ema_check(df, "series", "ts", "value", N=5, LL=-5.0,
                             UL=15.0, warning_stages=(0.9,)))
    assert got == ref


def test_macd_differential(spark, ref_modules, series):
    # NB: warning_stages=[] crashes the REFERENCE (macd.py:111
    # UnboundLocalError — status is only assigned inside the stage loop),
    # so the differential runs with a stage. Row 0 is skipped: the
    # reference leaves it uninitialized ("" / stale status, macd.py:81-109)
    # while the engine defines it via the ladder (documented divergence).
    conf = {"period1": 5, "period2": 15, "UL": 3.0, "LL": -3.0,
            "warning_stages": [0.5]}
    ref = run_reference(ref_modules["MACD"], conf, series)

    from anomaly_detection_spark.operators.sequential import macd_check

    df = series_df(spark, series)
    got = codes_of(macd_check(df, "series", "ts", "value", period1=5,
                              period2=15, LL=-3.0, UL=3.0,
                              warning_stages=(0.5,)))
    assert got[1:] == ref[1:]


def test_cumulative_differential(spark, ref_modules, series):
    conf = {"averaging": 5, "decay": 0.05, "UL": 1.0, "LL": -1.0,
            "warning_stages": [0.5]}
    ref = run_reference(ref_modules["Cumulative"], conf, series)

    from anomaly_detection_spark.operators.sequential import cumulative_check

    df = series_df(spark, series)
    got = codes_of(cumulative_check(df, "series", "ts", "value",
                                    averaging=5, decay=0.05,
                                    warning_stages=(0.5,)))
    assert got == ref


def test_hampel_differential(spark, ref_modules, series):
    """The reference checks memory[W+1] (one past the true center,
    hampel.py:91) and emits that row's verdict W-1 inserts later; the
    engine's offset=-1 mode reproduces the frame, and the comparison
    realigns emission index t -> checked row t-W+1."""
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        hampel_mod = importlib.import_module("algorithms.hampel")
    finally:
        sys.path.remove(os.path.join(REF, "src"))
    W = 3
    ref = run_reference(hampel_mod.Hampel,
                        {"W": W, "n_sigmas": 3.0, "K": 1.4826}, series)

    from anomaly_detection_spark.operators.windowed import hampel

    df = series_df(spark, series)
    mine = codes_of(hampel(df, "series", "ts", "value", W=W, offset=-1))
    n = len(series)
    # reference count increments after its warm-up check, so the first
    # defined verdict is at insert 2W+1
    for t in range(2 * W + 1, n):
        r = t - W + 1
        assert mine[r] == ref[t], (t, r, mine[r], ref[t])


def test_linear_fit_differential(spark, ref_modules, series):
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        lf_mod = importlib.import_module("algorithms.linear_fit")
    finally:
        sys.path.remove(os.path.join(REF, "src"))
    conf = {"N": 8, "UL": 2.0, "LL": -2.0, "warning_stages": [0.5],
            "confidence_norm": 1e12, "max_memory": 8}
    ref = run_reference(lf_mod.LinearFit, conf, series)

    from anomaly_detection_spark.operators.windowed import linear_fit_check

    df = series_df(spark, series)
    mine = codes_of(linear_fit_check(df, "series", "ts", "value", N=8,
                                     LL=-2.0, UL=2.0,
                                     warning_stages=(0.5,)))
    # warm-up boundary: the reference increments its count AFTER the
    # N-check, so its first defined verdict lands one row later (index N)
    # than the engine's (index N-1, which has N samples available).
    N = 8
    assert mine[N:] == ref[N:]
    assert all(c == 2 for c in mine[:N - 1]) and all(c == 2 for c in ref[:N])


def test_combination_and_or_differential(spark, ref_modules, series):
    """Combination with two sub-detectors under both determiners."""
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        comb_mod = importlib.import_module("algorithms.combination")
    finally:
        sys.path.remove(os.path.join(REF, "src"))

    sub_confs = [
        {"input_vector_size": 1, "UL": 20.0, "LL": -5.0,
         "warning_stages": [0.9], "output": [], "output_conf": [{}]},
        {"input_vector_size": 1, "N": 10, "X": 2.0, "warning_stages": [],
         "filtering": "None", "output": [], "output_conf": [{}]},
    ]
    refs = {}
    for det in ("AND()", "OR()"):
        conf = {
            "anomaly_algorithms": ["BorderCheck()", "Welford()"],
            "anomaly_algorithms_configurations": sub_confs,
            "status_determiner": det,
            "status_determiner_conf": {},
        }
        refs[det] = run_reference(comb_mod.Combination, conf, series)

    from pyspark.sql import functions as F

    from anomaly_detection_spark.codes import ladder_code, normalized
    from anomaly_detection_spark.operators.combination import (
        combine_and,
        combine_or,
    )
    from anomaly_detection_spark.operators.windowed import welford_windowed

    df = series_df(spark, series)
    checked = welford_windowed(
        df, "series", "ts", "value", N=10, X=2.0, out="c_w"
    ).withColumn(
        "c_b", ladder_code(normalized(F.col("value"), -5.0, 20.0), (0.9,))
    )
    got_and = codes_of(checked.withColumn("code", combine_and(["c_b", "c_w"])))
    got_or = codes_of(checked.withColumn("code", combine_or(["c_b", "c_w"])))
    assert got_and == refs["AND()"]
    assert got_or == refs["OR()"]


def test_reference_percentile_is_broken(ref_modules):
    """The reference's Percentile detector references self.buff_size which
    configure never sets (percentile.py:43-47 vs :87) — it cannot process
    a single message. Documented divergence: the engine implements the
    DOCUMENTED band semantics (windowed.percentile_check) instead."""
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        pct_mod = importlib.import_module("algorithms.percentile")
    finally:
        sys.path.remove(os.path.join(REF, "src"))
    det = pct_mod.Percentile()
    det.configure({
        "input_vector_size": 1, "percentile_range": [5, 95], "shift": 0,
        "filtering": "None", "output": [], "output_conf": [{}],
    })
    with pytest.raises(AttributeError):
        det.message_insert({"ftr_vector": [1.0], "timestamp": 1459926000.0})


def test_linear_fit_confidence_gate_differential(spark, ref_modules, series):
    """With a REAL confidence_norm the reference gates poor fits to
    Undefined; the engine's regr_syy/sxy SSE must gate the same rows."""
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        lf_mod = importlib.import_module("algorithms.linear_fit")
    finally:
        sys.path.remove(os.path.join(REF, "src"))
    conf = {"N": 8, "UL": 2.0, "LL": -2.0, "warning_stages": [0.5],
            "confidence_norm": 0.3, "max_memory": 8}
    ref = run_reference(lf_mod.LinearFit, conf, series)

    from anomaly_detection_spark.operators.windowed import linear_fit_check

    df = series_df(spark, series)
    mine = codes_of(linear_fit_check(df, "series", "ts", "value", N=8,
                                     LL=-2.0, UL=2.0, warning_stages=(0.5,),
                                     confidence_norm=0.3))
    N = 8
    assert mine[N:] == ref[N:]
    # the gate actually fires somewhere on this series
    assert 2 in mine[N:]


def test_ema_percentile_differential(spark, ref_modules, series):
    """start_on == window aligns the reference's warm-up with the engine's
    rolling-window NaN gate; alpha = 2/(period+1) maps period -> N.
    (With percentile < 50 the reference's [100-p, p] indexing inverts the
    band — a latent bug; the differential uses p > 50 where it is
    well-defined.)"""
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        ep_mod = importlib.import_module("algorithms.ema_percentile")
    finally:
        sys.path.remove(os.path.join(REF, "src"))
    conf = {"percentile": 90, "window": 20, "start_on": 20, "period": 9}
    ref = run_reference(ep_mod.EMA_Percentile, conf, series)

    from anomaly_detection_spark.operators.sequential import (
        ema_percentile_check,
    )

    df = series_df(spark, series)
    mine = codes_of(ema_percentile_check(df, "series", "ts", "value",
                                         N=9, percentile=90.0, window=20))
    assert mine == ref


def test_percent_score_determiner_differential(spark, ref_modules, series):
    """Combination under the PercentScore determiner returns a float
    meta-score; the engine's event-time range-frame percent_score must
    reproduce it element-wise (approx: float sums)."""
    import importlib
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        comb_mod = importlib.import_module("algorithms.combination")
    finally:
        sys.path.remove(os.path.join(REF, "src"))
    sub_confs = [
        {"input_vector_size": 1, "UL": 20.0, "LL": -5.0,
         "warning_stages": [0.9], "output": [], "output_conf": [{}]},
        {"input_vector_size": 1, "N": 10, "X": 2.0, "warning_stages": [],
         "filtering": "None", "output": [], "output_conf": [{}]},
    ]
    conf = {
        "anomaly_algorithms": ["BorderCheck()", "Welford()"],
        "anomaly_algorithms_configurations": sub_confs,
        "status_determiner": "PercentScore()",
        "status_determiner_conf": {"interval": 86400, "data_interval": 3600},
    }
    ref = run_reference(comb_mod.Combination, conf, series)

    from pyspark.sql import functions as F

    from anomaly_detection_spark.codes import ladder_code, normalized
    from anomaly_detection_spark.operators.windowed import (
        percent_score,
        welford_windowed,
    )

    df = series_df(spark, series)
    checked = welford_windowed(
        df, "series", "ts", "value", N=10, X=2.0, out="c_w"
    ).withColumn(
        "c_b", ladder_code(normalized(F.col("value"), -5.0, 20.0), (0.9,))
    )
    out = percent_score(checked, "series", "ts", ["c_b", "c_w"],
                        interval=86400, num_in_interval=24)
    mine = [r["score"] for r in out.orderBy("ts").collect()]
    assert len(mine) == len(ref)
    for i, (m, r) in enumerate(zip(mine, ref)):
        assert m == pytest.approx(r, abs=1e-9), i


def test_long_series_differential_core_three(spark, ref_modules):
    """Harden parity over a 1,500-point heavy-tailed series (EMA float
    drift, Welford long-window stability, cumulative decay depth)."""
    rng = np.random.default_rng(7)
    vals = (np.cumsum(rng.standard_t(3, 1500) * 0.5) + 50.0).tolist()

    from anomaly_detection_spark.operators.sequential import (
        cumulative_check,
        ema_check,
    )
    from anomaly_detection_spark.operators.windowed import welford_windowed

    df = series_df(spark, vals)

    ref = run_reference(ref_modules["EMA"],
                        {"N": 12, "UL": 80.0, "LL": 20.0,
                         "warning_stages": [0.9]}, vals)
    got = codes_of(ema_check(df, "series", "ts", "value", N=12, LL=20.0,
                             UL=80.0, warning_stages=(0.9,)))
    assert got == ref

    ref = run_reference(ref_modules["Welford"],
                        {"N": 50, "X": 2.5, "warning_stages": [0.8],
                         "filtering": "None"}, vals)
    got = codes_of(welford_windowed(df, "series", "ts", "value", N=50,
                                    X=2.5, warning_stages=(0.8,)))
    assert got == ref

    ref = run_reference(ref_modules["Cumulative"],
                        {"averaging": 10, "decay": 0.02, "UL": 1.0,
                         "LL": -1.0, "warning_stages": [0.5]}, vals)
    got = codes_of(cumulative_check(df, "series", "ts", "value",
                                    averaging=10, decay=0.02,
                                    warning_stages=(0.5,)))
    assert got == ref


def test_many_interleaved_series_equal_independent_reference_runs(
        spark, ref_modules):
    """The engine processes thousands of series in shared buckets; every
    series' verdicts must equal an INDEPENDENT reference run on that
    series alone (group isolation in the bucketed applyInPandas path)."""
    rng = np.random.default_rng(11)
    n_series, n_pts = 12, 60
    series_vals = {
        f"s{i:02d}": (np.cumsum(rng.normal(0, 1, n_pts)) + 10.0).tolist()
        for i in range(n_series)
    }
    rows = []
    for key, vals in series_vals.items():
        for t, v in enumerate(vals):
            rows.append((key, 1459926000.0 + t * 3600.0, float(v)))
    # interleave + shuffle input order: the engine must not care
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    from anomaly_detection_spark.operators.sequential import ema_check

    out = ema_check(df, "series", "ts", "value", N=5, LL=-5.0, UL=25.0,
                    warning_stages=(0.9,))
    got = {
        key: [r["code"] for r in grp]
        for key, grp in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: (r["series"], r["ts"])),
            key=lambda r: r["series"])
    }
    for key, vals in series_vals.items():
        ref = run_reference(ref_modules["EMA"],
                            {"N": 5, "UL": 25.0, "LL": -5.0,
                             "warning_stages": [0.9]}, vals)
        assert got[key] == ref, key


def test_row_order_invariance(spark):
    """Distributed inputs arrive in arbitrary order; every ordered check
    must produce identical verdicts regardless (the reference simply
    assumes in-order arrival — SURVEY.md §2.10)."""
    from pyspark.sql import functions as F

    from anomaly_detection_spark.operators.sequential import cumulative_check
    from anomaly_detection_spark.operators.windowed import welford_windowed

    rng = np.random.default_rng(13)
    vals = (np.cumsum(rng.normal(0, 1, 300)) + 5.0).tolist()
    df = series_df(spark, vals)
    shuffled = df.orderBy(F.rand(seed=99)).repartition(7)

    for op in (
        lambda d: welford_windowed(d, "series", "ts", "value", N=10, X=2.0),
        lambda d: cumulative_check(d, "series", "ts", "value",
                                   averaging=5, decay=0.05),
    ):
        a = {r["ts"]: r["code"] for r in op(df).collect()}
        b = {r["ts"]: r["code"] for r in op(shuffled).collect()}
        assert a == b


def test_feature_construction_differential(spark, ref_modules, series):
    """The reference's shift/average/periodic feature construction is
    BROKEN in this snapshot: average_construction indexes a python list
    with numpy syntax (self.memory[:,0], anomaly_detection.py:342,373,391)
    and raises TypeError on the first full-memory sample — its own golden
    tests (unit_tests.py:1043-1175) predate the regression. Pinned here;
    the engine implements the documented semantics (mean of last k incl.
    current, value k back), oracle-checked in
    shift_avg_time_features_events."""
    det = ref_modules["BorderCheck"]()
    det.configure({
        "input_vector_size": 1, "UL": 100.0, "LL": -100.0,
        "warning_stages": [], "output": [], "output_conf": [{}],
        "averages": [[2, 3]], "shifts": [[1, 2]],
    })
    base = 1459926000.0
    warm = [det.feature_construction([float(v)], base + i * 3600.0)
            for i, v in enumerate(series[:2])]
    assert all(fv is False for fv in warm)  # warm-up path still works
    with pytest.raises(TypeError):
        for i, v in enumerate(series[2:6]):
            det.feature_construction([float(v)], base + (i + 2) * 3600.0)


def test_negative_warning_stages_differential(spark, ref_modules, series):
    """The reference's shipped configs use NEGATIVE warning stages (e.g.
    configuration/ema.json: [0.3, -0.2]); a negative stage makes every
    in-band value a warning under the reference's ascending-stage loop.
    The engine's abs(vn) > min(stages) formulation must agree exactly."""
    conf = {"N": 5, "UL": 15.0, "LL": -5.0, "warning_stages": [0.3, -0.2]}
    ref = run_reference(ref_modules["EMA"], conf, series)

    from anomaly_detection_spark.operators.sequential import ema_check

    df = series_df(spark, series)
    got = codes_of(ema_check(df, "series", "ts", "value", N=5, LL=-5.0,
                             UL=15.0, warning_stages=(0.3, -0.2)))
    assert got == ref
    assert 0 in ref  # negative stage really forces warnings


def test_config_compiler_fuzz_differential(spark, ref_modules):
    """Differential FUZZ of the config compiler (config.py:277): 50 seeded
    reference-shape configs sampled over algorithm x params x filtering x
    stack size, each compiled by compile_config and replayed through the
    ACTUAL reference detectors; every per-detector code column and the
    OR-combined status_code must match element-wise.

    Scope: the five reference detectors importable without real
    scipy/sklearn (BorderCheck, EMA, Welford windowed+streaming, MACD,
    Cumulative). Retrain-keyed algorithms (IsolationForest, Clustering)
    cannot run reference-side here (sklearn is stubbed) — their compile
    paths are golden-tested in test_config_compile.py instead.

    Known reference quirks honored: MACD leaves row 0's status
    uninitialized (macd.py:81-109) so row 0 is skipped when MACD is in
    the stack, and MACD crashes on empty warning_stages (macd.py:111) so
    every sampled config carries >=1 stage. Time filters follow the
    reference's no-midnight-wrap strict-inequality semantics
    (consumer.py:195-221), emulated independently in plain Python here so
    the engine's Column predicate is cross-checked, not self-checked."""
    import ast

    from anomaly_detection_spark.config import compile_config

    n = 60
    start_ts, step = 1459926000.0, 3600.0

    def sample_detector(rng):
        alg = str(rng.choice(
            ["BorderCheck", "EMA", "Welford", "MACD", "Cumulative"]))
        ws = sorted(
            float(w) for w in rng.choice(
                [0.5, 0.7, 0.8, 0.9, 0.95],
                size=int(rng.integers(1, 3)), replace=False)
        )
        if alg == "BorderCheck":
            conf = {"UL": float(rng.uniform(12, 30)),
                    "LL": float(rng.uniform(-10, 5)),
                    "warning_stages": ws}
        elif alg == "EMA":
            conf = {"N": int(rng.integers(2, 13)),
                    "UL": float(rng.uniform(10, 25)),
                    "LL": float(rng.uniform(-8, 2)),
                    "warning_stages": ws}
        elif alg == "Welford":
            conf = {"X": float(rng.uniform(1.5, 3.0)),
                    "warning_stages": ws}
            if rng.random() < 0.5:
                conf["N"] = int(rng.integers(5, 16))  # windowed mode
        elif alg == "MACD":
            p1 = int(rng.integers(2, 8))
            conf = {"period1": p1, "period2": p1 + int(rng.integers(2, 12)),
                    "UL": float(rng.uniform(1.0, 5.0)),
                    "LL": float(rng.uniform(-5.0, -1.0)),
                    "warning_stages": ws}
        else:  # Cumulative — verdict uses hard +-1 bounds, UL/LL inert
            conf = {"averaging": int(rng.integers(2, 12)),
                    "decay": float(rng.uniform(0.0, 0.15)),
                    "warning_stages": ws}
        return alg, conf

    failures = []
    for trial in range(50):
        rng = np.random.default_rng(1000 + trial)
        vals = np.cumsum(rng.normal(0, 1, n)) + 10.0
        vals[int(rng.integers(10, n))] += float(
            rng.choice([-1.0, 1.0])) * float(rng.uniform(15, 30))
        vals = [float(v) for v in vals]

        dets = [sample_detector(rng) for _ in range(int(rng.integers(1, 4)))]
        filters = []
        for alg, _ in dets:
            if alg != "MACD" and rng.random() < 0.3:
                # string form: the reference configures filters as
                # literal-eval'd tuple strings
                filters.append(f"(({int(rng.integers(0, 24))}, 0, 0), "
                               f"({int(rng.integers(1, 13))}, 0, 0))")
            else:
                filters.append(None)

        config = {
            "anomaly_detection_alg": [a for a, _ in dets],
            # deep-ish copy: the reference's configure() sorts
            # warning_stages in place
            "anomaly_detection_conf": [
                {k: (list(v) if isinstance(v, list) else v)
                 for k, v in c.items()} for _, c in dets],
            "filtering": filters,
        }

        out = compile_config(config)(series_df(spark, vals)) \
            .orderBy("ts").collect()

        # reference replay: per detector, skip filtered-out messages
        # (never inserted -> no verdict -> Undefined), insert the rest
        ref_codes = []
        for (alg, conf), flt in zip(dets, filters):
            keep = [True] * n
            if flt is not None:
                (th, tm, ts_), (dh, dm, ds) = ast.literal_eval(flt)
                tgt, tol = th * 3600 + tm * 60 + ts_, dh * 3600 + dm * 60 + ds
                keep = [abs((start_ts + j * step) % 86400 - tgt) < tol
                        for j in range(n)]
            det = ref_modules[alg]()
            base = {"input_vector_size": 1, "output": [], "output_conf": [{}],
                    "filtering": "None"}
            base.update({k: (list(v) if isinstance(v, list) else v)
                         for k, v in conf.items()})
            det.configure(base)
            codes = []
            for j, v in enumerate(vals):
                if not keep[j]:
                    codes.append(2)
                    continue
                ret = det.message_insert(
                    {"ftr_vector": [v], "timestamp": start_ts + j * step})
                codes.append(ret[1] if isinstance(ret, tuple) and len(ret) == 2
                             else getattr(det, "status_code", 2))
            ref_codes.append(codes)

        lo_all = 1 if any(a == "MACD" for a, _ in dets) else 0
        for i, (alg, conf) in enumerate(dets):
            col = f"code_{i}_{alg.lower()}"
            got = [r[col] for r in out]
            lo = 1 if alg == "MACD" else 0
            if got[lo:] != ref_codes[i][lo:]:
                failures.append((trial, col, conf, filters[i]))
        status_ref = [min(cs) for cs in zip(*ref_codes)]
        if [r["status_code"] for r in out][lo_all:] != status_ref[lo_all:]:
            failures.append((trial, "status_code", config, None))

    assert not failures, failures[:5]


def test_combination_config_differential(spark, ref_modules):
    """Differential fuzz of the Combination compile path (VERDICT r4
    next #2): 20 seeded Combination configs — 2-3 sub-detectors sampled
    from the importable reference algorithms that combination.py's
    eval-namespace can build (BorderCheck/EMA/Welford; Cumulative is not
    imported there, MACD has the uninitialized-row-0 quirk), determiner
    AND or OR — compiled by compile_config and replayed through the
    reference's ACTUAL Combination class; the combined code column must
    match element-wise. The reference's own golden
    (unit_tests.py:1021-1040, two BorderChecks, AND + OR) is trial -1."""
    from anomaly_detection_spark.config import compile_config

    n = 50
    start_ts, step = 1459926000.0, 3600.0
    base = {"input_vector_size": 1, "output": [], "output_conf": [{}],
            "filtering": "None"}

    def sample_sub(rng):
        alg = str(rng.choice(["BorderCheck", "EMA", "Welford"]))
        ws = sorted(float(w) for w in rng.choice(
            [0.5, 0.7, 0.8, 0.9], size=int(rng.integers(1, 3)),
            replace=False))
        if alg == "BorderCheck":
            conf = {"UL": float(rng.uniform(12, 30)),
                    "LL": float(rng.uniform(-10, 5)), "warning_stages": ws}
        elif alg == "EMA":
            conf = {"N": int(rng.integers(2, 13)),
                    "UL": float(rng.uniform(10, 25)),
                    "LL": float(rng.uniform(-8, 2)), "warning_stages": ws}
        else:
            conf = {"X": float(rng.uniform(1.5, 3.0)), "warning_stages": ws}
            if rng.random() < 0.5:
                conf["N"] = int(rng.integers(5, 16))
        return alg, conf

    trials = []
    # the reference's own unit-test golden: two BorderChecks, both
    # determiners
    for det in ("AND()", "OR()"):
        trials.append((
            [0.2, 0.5, 1.0, 1.5, -0.3],
            [("BorderCheck", {"UL": 0.5, "LL": 0, "warning_stages": [0.9]}),
             ("BorderCheck", {"UL": 1, "LL": 0, "warning_stages": [0.9]})],
            det,
        ))
    for trial in range(20):
        rng = np.random.default_rng(5000 + trial)
        vals = np.cumsum(rng.normal(0, 1, n)) + 10.0
        vals[int(rng.integers(10, n))] += float(
            rng.choice([-1.0, 1.0])) * float(rng.uniform(15, 30))
        subs = [sample_sub(rng) for _ in range(int(rng.integers(2, 4)))]
        det = str(rng.choice(["AND()", "OR()"]))
        trials.append(([float(v) for v in vals], subs, det))

    failures = []
    for t_i, (vals, subs, det) in enumerate(trials):
        comb_conf = {
            "anomaly_algorithms": [f"{a}()" for a, _ in subs],
            "anomaly_algorithms_configurations": [
                dict(base, **{k: (list(v) if isinstance(v, list) else v)
                              for k, v in c.items()}) for _, c in subs],
            "status_determiner": det,
            "status_determiner_conf": {},
        }
        config = {"anomaly_detection_alg": ["Combination()"],
                  "anomaly_detection_conf": [
                      dict(base, **{k: (list(v) if isinstance(v, list)
                                        else v) for k, v in comb_conf.items()})]}
        out = compile_config(config)(series_df(spark, vals)) \
            .orderBy("ts").collect()

        ref = ref_modules["Combination"]()
        ref.configure(dict(base, **comb_conf))
        ref_codes = []
        for j, v in enumerate(vals):
            ref.message_insert({"ftr_vector": [float(v)],
                                "timestamp": start_ts + j * step})
            ref_codes.append(ref.status_code)

        got = [r["code_0_combination"] for r in out]
        if got != ref_codes:
            failures.append((t_i, det, subs, list(zip(got, ref_codes))[:8]))
    assert not failures, failures[:3]


def test_combination_percent_score_differential(spark, ref_modules):
    """PercentScore determiner parity: the compiled Combination's float
    score column vs the reference PercentScore class driven by the
    reference sub-detectors' actual statuses."""
    from anomaly_detection_spark.config import compile_config

    n = 40
    start_ts, step = 1459926000.0, 3600.0
    base = {"input_vector_size": 1, "output": [], "output_conf": [{}],
            "filtering": "None"}
    rng = np.random.default_rng(42)
    vals = [float(v) for v in np.cumsum(rng.normal(0, 2, n)) + 10.0]
    subs = [("BorderCheck", {"UL": 14.0, "LL": 4.0,
                             "warning_stages": [0.7, 0.9]}),
            ("EMA", {"N": 5, "UL": 13.0, "LL": 5.0,
                     "warning_stages": [0.8]})]
    det_conf = {"interval": 4 * 3600, "data_interval": 3600}
    comb_conf = {
        "anomaly_algorithms": [f"{a}()" for a, _ in subs],
        "anomaly_algorithms_configurations": [
            dict(base, **c) for _, c in subs],
        "status_determiner": "PercentScore()",
        "status_determiner_conf": dict(det_conf),
    }
    config = {"anomaly_detection_alg": ["Combination()"],
              "anomaly_detection_conf": [dict(base, **comb_conf)]}
    out = compile_config(config)(series_df(spark, vals)) \
        .orderBy("ts").collect()

    ref = ref_modules["Combination"]()
    ref.configure(dict(base, **{**comb_conf,
                                "status_determiner_conf": dict(det_conf)}))
    ref_scores = []
    for j, v in enumerate(vals):
        ref.message_insert({"ftr_vector": [float(v)],
                            "timestamp": start_ts + j * step})
        ref_scores.append(float(ref.status_code))

    got = [float(r["code_0_combination"]) for r in out]
    assert got == pytest.approx(ref_scores, abs=1e-9)


def test_normalization_config_differential(spark, ref_modules):
    """`normalization` config-key parity (ADVICE r4 / VERDICT next #3):
    a BorderCheck config carrying LastNAverage / PeriodicLastNAverage
    must emit the reference's exact suggested_value stream — including
    the no-suggestion warm-up (errors while memory fills), the
    suggestion-not-raw feedback, and the periodic stride slice. The
    reference's suggestions are captured from its actual output hook."""
    from anomaly_detection_spark.config import compile_config

    n = 80
    rng = np.random.default_rng(77)
    vals = [float(v) for v in rng.uniform(0, 14, n)]
    vals[1] = 30.0            # error BEFORE memory is full -> no suggestion
    for j in (15, 16, 30, 55):
        vals[j] = 30.0 if j % 2 else -20.0

    base = {"input_vector_size": 1, "output": [], "output_conf": [{}],
            "filtering": "None"}

    class Rec:
        def __init__(self):
            self.sugs = []

        def send_out(self, **kw):
            self.sugs.append(kw.get("suggested_value"))

    for kind, nconf in [("LastNAverage()", {"N": 3}),
                        ("PeriodicLastNAverage()", {"N": 3, "period": 2})]:
        det_conf = {"UL": 12.0, "LL": 2.0, "warning_stages": [0.9],
                    "normalization": kind,
                    "normalization_conf": dict(nconf)}
        config = {"anomaly_detection_alg": ["BorderCheck()"],
                  "anomaly_detection_conf": [dict(base, **det_conf)]}
        out = compile_config(config)(series_df(spark, vals)) \
            .orderBy("ts").collect()

        det = ref_modules["BorderCheck"]()
        det.configure(dict(base, **{**det_conf,
                                    "normalization_conf": dict(nconf)}))
        rec = Rec()
        det.outputs = [rec]
        codes = []
        for j, v in enumerate(vals):
            ret = det.message_insert(
                {"ftr_vector": [float(v)],
                 "timestamp": 1459926000.0 + j * 3600.0})
            codes.append(ret[1])
        ref_sug = [s[0] if isinstance(s, list) else None for s in rec.sugs]

        got_codes = [r["code_0_bordercheck"] for r in out]
        got_sug = [r["suggested_value_0_bordercheck"] for r in out]
        assert got_codes == codes, kind
        assert len(got_sug) == len(ref_sug)
        for g, r in zip(got_sug, ref_sug):
            if r is None:
                assert g is None, kind
            else:
                assert g == pytest.approx(r, abs=1e-12), kind
        # the planted pre-warm-up error really exercised the
        # no-suggestion branch, and at least one repair fired
        assert ref_sug[1] is None and any(s is not None for s in ref_sug)
