"""Golden status-code sequences copied from the reference's unit tests
(/root/reference/src/unit_tests.py) — the engine must reproduce them
element-for-element (constraint-check pass-rate parity, BASELINE.md)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.operators import sequential, windowed
from anomaly_detection_spark.operators.combination import combine_and, combine_or
from anomaly_detection_spark.operators.constraints import border_check
from tests.conftest import codes_of, series_df


def test_border_check_golden(spark):
    # unit_tests.py:160-186 — UL=4 LL=2 stages [0.7, 0.9]
    df = series_df(spark, [3, 5, 1, 2.1])
    out = df.withColumn("code", border_check(F.col("value"), 2, 4, [0.7, 0.9]))
    assert codes_of(out) == [1, -1, -1, 0]


def test_welford_windowed_golden(spark):
    # unit_tests.py:219-244 — N=4 X=2 stages [0.7, 0.9]
    ok = series_df(spark, [1, 2, 3, 4, 1, 2])
    out = windowed.welford_windowed(ok, "series", "ts", "value",
                                    N=4, X=2, warning_stages=[0.7, 0.9])
    assert codes_of(out) == [2, 2, 2, 2, 1, 1]

    err = series_df(spark, [1, 2, 3, 4, -0.1, 5.73])
    out = windowed.welford_windowed(err, "series", "ts", "value",
                                    N=4, X=2, warning_stages=[0.7, 0.9])
    assert codes_of(out) == [2, 2, 2, 2, -1, -1]


def test_welford_streaming_golden(spark):
    # unit_tests.py:274-305 — X=2, no warning stages
    ok = series_df(spark, [1, 2, 2.4, 2.6, 1, 3.1])
    out = windowed.welford_streaming(ok, "series", "ts", "value",
                                     X=2, warning_stages=[])
    assert codes_of(out) == [2, 2, 1, 1, 1, 1]

    err = series_df(spark, [1, 2, 3, -1, 5, -2.5])
    out = windowed.welford_streaming(err, "series", "ts", "value",
                                     X=2, warning_stages=[])
    assert codes_of(out) == [2, 2, -1, -1, -1, -1]


def test_ema_golden(spark):
    # unit_tests.py:348-356 — N=5 UL=4 LL=2 stages [0.7, 0.9]
    df = series_df(spark, [3, 4, 4, 4, 4, 5, 5, 5])
    out = sequential.ema_check(df, "series", "ts", "value",
                               N=5, LL=2, UL=4, warning_stages=[0.7, 0.9])
    assert codes_of(out) == [1, 1, 1, 0, 0, -1, -1, -1]


def test_macd_golden(spark):
    # unit_tests.py:746-766 — p1=10 p2=30 UL=1 LL=-1 stages [0.5]
    vals = [1.0] * 30 + [-0.4 * i for i in range(10)]
    df = series_df(spark, vals)
    out = sequential.macd_check(df, "series", "ts", "value",
                                period1=10, period2=30, LL=-1, UL=1,
                                warning_stages=[0.5])
    expected = [1] * 30 + [1, 1, 1, 0, 0, 0, -1, -1, -1, -1]
    assert codes_of(out) == expected


def test_butterworth_kernel_golden():
    # unit_tests.py:415-429 — butter(3, 0.4) coefficients to 8 decimals
    b, a = sequential.butter_lowpass(3, 0.4)
    np.testing.assert_allclose(
        a, [1.0, -0.57724052, 0.42178705, -0.05629724], atol=1e-8)
    np.testing.assert_allclose(
        b, [0.09853116, 0.29559348, 0.29559348, 0.09853116], atol=1e-8)
    zi = sequential.lfilter_zi(b, a)
    np.testing.assert_allclose(zi, [0.90146884, 0.02863483, 0.1548284], atol=1e-8)


def test_filtering_mode1_golden(spark):
    # unit_tests.py:442-449 — order=3 fc=0.4 UL=1 LL=0 stages [0.7,0.9]
    df = series_df(spark, [0, 0, 0, 1, 2, 2, 2])
    out = sequential.filtering_check(df, "series", "ts", "value",
                                     filter_order=3, cutoff_frequency=0.4,
                                     mode=1, LL=0, UL=1,
                                     warning_stages=[0.7, 0.9])
    assert codes_of(out) == [0, 1, 1, -1, -1, 1, 1]


def test_filtering_mode0_golden(spark):
    # unit_tests.py:462-469
    df = series_df(spark, [0.5, 0.5, 0.5, 1, 1, 1, 2, 2, 2])
    out = sequential.filtering_check(df, "series", "ts", "value",
                                     filter_order=3, cutoff_frequency=0.4,
                                     mode=0, LL=0, UL=1,
                                     warning_stages=[0.7, 0.9])
    assert codes_of(out) == [0, 1, 1, 1, 1, 0, -1, -1, -1]


def test_filtering_constant_stream(spark):
    # unit_tests.py:433-440 — constant 1s: filtered == 1 to 8 decimals
    df = series_df(spark, [1.0] * 10)
    out = sequential.filtering_check(df, "series", "ts", "value",
                                     filter_order=3, cutoff_frequency=0.4,
                                     mode=0, LL=0, UL=1, warning_stages=[])
    filt = [r["filtered"] for r in out.orderBy("ts").collect()]
    np.testing.assert_allclose(filt, np.ones(10), atol=1e-8)


def test_combination_golden(spark):
    # unit_tests.py:1021-1040 — two BorderChecks (UL=.5 LL=0 / UL=1 LL=0,
    # stages [0.9]); AND: [0.2, 1, 1.5] -> 1, 0, -1; OR: [0.2, .5, 1.5] -> 1, 0, -1
    df = series_df(spark, [0.2, 1.0, 1.5])
    df = df.withColumn("c1", border_check(F.col("value"), 0, 0.5, [0.9]))
    df = df.withColumn("c2", border_check(F.col("value"), 0, 1.0, [0.9]))
    out = df.withColumn("code", combine_and(["c1", "c2"]))
    assert codes_of(out) == [1, 0, -1]

    df2 = series_df(spark, [0.2, 0.5, 1.5])
    df2 = df2.withColumn("c1", border_check(F.col("value"), 0, 0.5, [0.9]))
    df2 = df2.withColumn("c2", border_check(F.col("value"), 0, 1.0, [0.9]))
    out2 = df2.withColumn("code", combine_or(["c1", "c2"]))
    assert codes_of(out2) == [1, 0, -1]


def test_cumulative_matches_python_oracle(spark):
    # semantics of /root/reference/src/algorithms/cumulative.py:60-100,
    # oracle re-derived in straight-line python
    vals = [1.0, 1.1, 0.9, 1.0, 5.0, 5.2, 5.1, 1.0, 1.0, 1.0]
    averaging, decay = 3, 0.1

    mem, cum, expected = [], 0.0, []
    prev = 0.0
    for v in vals:
        mem.append(v)
        mem = mem[-averaging:]
        rm = sum(mem) / len(mem)
        delta = (rm - prev) / abs(rm)
        prev = rm
        cum = (cum + delta) * (1 - decay)
        expected.append(cum)

    df = series_df(spark, vals)
    out = sequential.cumulative_check(df, "series", "ts", "value",
                                      averaging=averaging, decay=decay,
                                      warning_stages=[0.7, 0.9])
    got = [r["cusum"] for r in out.orderBy("ts").collect()]
    np.testing.assert_allclose(got, expected, atol=1e-9)
