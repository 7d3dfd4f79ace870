"""Window-function checks — the reference's rolling detectors re-expressed
as Spark window aggregates (JVM-side, no Python).

Each function takes (df, key column(s), order column, value column, params)
and returns df plus a named int code column. Per-series ordering lives
inside a ``Window.partitionBy(keys).orderBy(order)`` — on a cluster the
shuffle is one hash-partition by key; all frames are bounded so state stays
O(frame) per task.

Reference parity notes are cited per function.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_spark.codes import UNDEFINED_CODE, ladder_code


def _w(keys, order):
    keys = keys if isinstance(keys, (list, tuple)) else [keys]
    return Window.partitionBy(*keys).orderBy(order)


def _epoch_seconds(df: DataFrame, ts: Column) -> Column:
    """Event time as epoch seconds. Inspects the analyzed dtype instead of
    probing with a try/except cast — a caught AnalysisException prints a
    full JVM stack into driver logs. Numeric columns cast directly;
    timestamp/date columns go through unix_timestamp (ANSI mode forbids
    timestamp->long casts)."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    dt = df.select(ts.alias("_t")).schema[0].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
        return F.unix_timestamp(ts)
    return ts.cast("long")


def welford_windowed(
    df: DataFrame, keys, order: str, value: str, *,
    N: int, X: float, warning_stages: Sequence[float] = (),
    out: str = "code",
) -> DataFrame:
    """Windowed Welford check (/root/reference/src/algorithms/welford.py:103-174):
    verdict for row t uses mean/sample-stddev of the previous N values
    (rows t-N .. t-1); rows with fewer than N predecessors are Undefined.
    vn = (v - mean) / (X * s)   (equivalent to the band normalization with
    UL/LL = mean +- X*s)."""
    w = _w(keys, order)
    frame = w.rowsBetween(-N, -1)
    # materialize the two frame aggregates once — the ladder references
    # vn several times and each reference would otherwise carry its own
    # avg/stddev window buffer (same fix as hampel; ~halves the fused
    # Window operator's per-row work)
    tmp_m, tmp_s = f"_wf_mean_{out}", f"_wf_s_{out}"
    res = df.withColumn(tmp_m, F.avg(value).over(frame)) \
            .withColumn(tmp_s, F.stddev_samp(value).over(frame))
    vn = _welford_vn(F.col(value), F.col(tmp_m), X * F.col(tmp_s))
    code = F.when(
        F.row_number().over(w) <= N, F.lit(UNDEFINED_CODE)
    ).otherwise(ladder_code(vn, warning_stages))
    return res.withColumn(out, code).drop(tmp_m, tmp_s)


def _welford_vn(value, mean, band):
    """The reference's zero-variance branch (welford.py:104-113): with
    UL = mean+X*s == LL = mean-X*s (s = 0: an all-equal window — REAL at
    larger sf with 2-decimal values; found by the sf0.3 gate as an ANSI
    DIVIDE_BY_ZERO), value == mean is OK (vn 0) and anything else is an
    error (vn inf). Division only happens when the band is nonzero."""
    return (
        F.when(band != 0.0, (value - mean) / band)
        .when(value == mean, F.lit(0.0))
        .otherwise(F.lit(float("inf")))
    )


def welford_streaming(
    df: DataFrame, keys, order: str, value: str, *,
    X: float, warning_stages: Sequence[float] = (),
    out: str = "code",
) -> DataFrame:
    """Streaming Welford check (/root/reference/src/algorithms/welford.py:176-191).

    The reference's online recurrence (mean_t, M2_t) is algebraically the
    expanding mean and sum-of-squared-deviations, so the verdict at row t
    (0-based) uses avg / population-stddev over rows 0..t-1 with
    UL/LL = mean +- X*sqrt(M2/count); rows 0 and 1 are Undefined
    (count<=1). This makes an inherently sequential scorer a plain
    unbounded-preceding window aggregate — no recurrence needed.
    """
    w = _w(keys, order)
    frame = w.rowsBetween(Window.unboundedPreceding, -1)
    # buffer-dedup: one avg + one stddev window expression (see
    # welford_windowed)
    tmp_m, tmp_s = f"_ws_mean_{out}", f"_ws_s_{out}"
    res = df.withColumn(tmp_m, F.avg(value).over(frame)) \
            .withColumn(tmp_s, F.stddev_pop(value).over(frame))
    vn = _welford_vn(F.col(value), F.col(tmp_m), X * F.col(tmp_s))
    code = F.when(
        F.row_number().over(w) <= 2, F.lit(UNDEFINED_CODE)
    ).otherwise(ladder_code(vn, warning_stages))
    return res.withColumn(out, code).drop(tmp_m, tmp_s)


def hampel(
    df: DataFrame, keys, order: str, value: str, *,
    W: int, n_sigmas: float = 3.0, K: float = 1.4826,
    out: str = "code", suggested: str | None = None, offset: int = 0,
) -> DataFrame:
    """Centered Hampel filter (/root/reference/src/algorithms/hampel.py:88-98,
    documented semantics: the checked sample is the window CENTER; the
    reference indexes memory[W+1], an off-by-one we deliberately fix).

    Flag row t iff |x_t - median(x_{t-W}..x_{t+W})| > n_sigmas * K * MAD.
    Exact median via sort of the collected frame (2W+1 values, odd) —
    all JVM higher-order functions, no UDF. Edge rows (incomplete window)
    are Undefined.

    ``offset`` shifts the frame off-center: offset=-1 reproduces the
    reference's memory[W+1] indexing (window [r-W-1, r+W-1] around the
    checked row) bug-for-bug for differential parity tests.
    """
    w = _w(keys, order)
    frame = w.rowsBetween(-W + offset, W + offset)
    # materialize the sorted frame ONCE: every downstream expression
    # references the column, not the window expression — otherwise each
    # of the ~16 references spawns its own collect_list window buffer in
    # the (single, fused) Window operator (observed in the executed
    # plan; the median/MAD math then runs row-local in codegen)
    tmp = f"_hampel_arr_{out}"
    res = df.withColumn(
        tmp, F.array_sort(F.collect_list(F.col(value)).over(frame)))
    arr = F.col(tmp)
    n = F.size(arr)
    med = F.element_at(arr, (n / 2 + 1).cast("int"))  # exact for odd n
    devs = F.array_sort(F.transform(arr, lambda e: F.abs(e - med)))
    mad = F.element_at(devs, (n / 2 + 1).cast("int"))
    is_out = F.abs(F.col(value) - med) > n_sigmas * K * mad
    code = (
        F.when(n < 2 * W + 1, F.lit(UNDEFINED_CODE))
        .when(is_out, F.lit(-1))
        .otherwise(F.lit(1))
    )
    res = res.withColumn(out, code)
    if suggested:
        res = res.withColumn(
            suggested, F.when(is_out & (n == 2 * W + 1), med).otherwise(F.col(value))
        )
    return res.drop(tmp)


def percentile_check(
    df: DataFrame, keys, order: str, value: str, *,
    buff_size: int, percentile: float, out: str = "code",
) -> DataFrame:
    """Percentile-band check (documented semantics of
    /root/reference/src/algorithms/percentile.py:83-98 — the reference has
    latent bugs there; we implement the documented behavior and define the
    OK path explicitly): error iff the value falls outside
    [P_{100-p}, P_p] of the trailing ``buff_size`` values (inclusive of the
    current row); warm-up rows Undefined. Exact linear-interpolation
    percentile (matches numpy / DuckDB quantile_cont)."""
    w = _w(keys, order)
    frame = w.rowsBetween(-(buff_size - 1), 0)
    hi = F.expr(f"percentile({value}, {percentile / 100.0})").over(frame)
    lo = F.expr(f"percentile({value}, {(100.0 - percentile) / 100.0})").over(frame)
    cnt = F.count(value).over(frame)
    # 1e-9 margin: interpolated quantiles differ by ~1 ulp across engines
    # (and partial-agg orders); values that close to the band edge count
    # as inside so verdicts are reproducible bit-for-bit
    code = (
        F.when(cnt < buff_size, F.lit(UNDEFINED_CODE))
        .when((F.col(value) > hi + 1e-9) | (F.col(value) < lo - 1e-9),
              F.lit(-1))
        .otherwise(F.lit(1))
    )
    return df.withColumn(out, code)


def linear_fit_check(
    df: DataFrame, keys, order: str, value: str, *,
    N: int, LL: float, UL: float, warning_stages: Sequence[float] = (),
    confidence_norm: float | None = None, out: str = "code",
) -> DataFrame:
    """Trend check (/root/reference/src/algorithms/linear_fit.py:86-108):
    OLS slope of the last N values against sample index (np.polyfit deg=1),
    border-checked. ``regr_slope`` over a bounded frame; x = per-series row
    number, which matches polyfit's 0..N-1 axis up to the constant offset
    that slope is invariant to.

    ``confidence_norm`` reproduces the reference's fit-quality gate
    (linear_fit.py:104-108): Undefined when SSE / current_value >
    confidence_norm, with SSE = regr_syy - slope*regr_sxy (the exact
    residual sum polyfit(full=True) returns)."""
    w = _w(keys, order)
    rn = F.row_number().over(w)
    dfx = df.withColumn("_x", rn.cast("double"))
    frame = _w(keys, order).rowsBetween(-(N - 1), 0)
    # materialize the regression aggregates once (the ladder's multiple
    # vn references would otherwise each carry their own regr_slope
    # window buffer — same fix as hampel/welford)
    tmp = f"_lf_slope_{out}"
    dfx = dfx.withColumn(tmp, F.expr(f"regr_slope({value}, _x)").over(frame))
    slope = F.col(tmp)
    drops = ["_x", tmp]
    vn = 2.0 * (slope - (UL + LL) / 2.0) / (UL - LL)
    verdict = ladder_code(vn, warning_stages)
    if confidence_norm is not None:
        tmp_sse = f"_lf_sse_{out}"
        dfx = dfx.withColumn(
            tmp_sse, F.expr(f"regr_syy({value}, _x)").over(frame)
            - slope * F.expr(f"regr_sxy({value}, _x)").over(frame))
        drops.append(tmp_sse)
        verdict = F.when(F.col(tmp_sse) / F.col(value) > confidence_norm,
                         F.lit(UNDEFINED_CODE)).otherwise(verdict)
    code = F.when(rn < N, F.lit(UNDEFINED_CODE)).otherwise(verdict)
    return dfx.withColumn(out, code).drop(*drops)


def percent_score(
    df: DataFrame, keys, ts_seconds: Column | str, codes: Sequence[str], *,
    interval: float, num_in_interval: int, out: str = "score",
) -> DataFrame:
    """PercentScore meta-signal (/root/reference/src/algorithms/combination.py:178-218):
    per-row score = (1*warnings + 2*errors) / (2*K); convoluted score =
    sum of scores with timestamp in (now-interval, now] divided by
    max(num_in_interval, rows_in_window). Event-time range frame over
    integer epoch seconds (strict > now-interval == >= now-interval+1)."""
    ts = F.col(ts_seconds) if isinstance(ts_seconds, str) else ts_seconds
    tsec = _epoch_seconds(df, ts)
    per_row = sum(
        F.when(F.col(c) == 0, 1.0).when(F.col(c) == -1, 2.0).otherwise(0.0)
        for c in codes
    ) / (2.0 * len(codes))
    keys = keys if isinstance(keys, (list, tuple)) else [keys]
    w = (
        Window.partitionBy(*keys)
        .orderBy(tsec)
        .rangeBetween(-(int(interval) - 1), 0)
    )
    dfx = df.withColumn("_ps", per_row)
    conv = F.sum("_ps").over(w) / F.greatest(
        F.lit(float(num_in_interval)), F.count("_ps").over(w).cast("double")
    )
    return dfx.withColumn(out, conv).drop("_ps")


# ---------------------------------------------------------------------------
# Feature construction (reference anomaly_detection.py:288-452)
# ---------------------------------------------------------------------------

def shift_features(df: DataFrame, keys, order: str, value: str,
                   shifts: Sequence[int], prefix: str = "shift_") -> DataFrame:
    """Lag features (anomaly_detection.py:384-393)."""
    w = _w(keys, order)
    for k in shifts:
        df = df.withColumn(f"{prefix}{k}", F.lag(value, k).over(w))
    return df


def average_features(df: DataFrame, keys, order: str, value: str,
                     intervals: Sequence[int], prefix: str = "avg_") -> DataFrame:
    """Rolling means of the last k values incl. current
    (anomaly_detection.py:330-346)."""
    for k in intervals:
        w = _w(keys, order).rowsBetween(-(k - 1), 0)
        df = df.withColumn(f"{prefix}{k}", F.avg(value).over(w))
    return df


def periodic_average_features(df: DataFrame, keys, order: str, value: str,
                              period: int, counts: Sequence[int],
                              prefix: str = "pavg_") -> DataFrame:
    """Seasonal-lag means: mean of every `period`-th past sample, `n` samples,
    most-recent first (anomaly_detection.py:348-382)."""
    w = _w(keys, order)
    for n in counts:
        lags = [F.lag(value, i * period).over(w) for i in range(n)]
        arr = F.array(*lags)
        df = df.withColumn(
            f"{prefix}{period}_{n}",
            F.aggregate(arr, F.lit(0.0), lambda a, e: a + e) / n,
        )
    return df


def time_features(df: DataFrame, ts: str, which: Sequence[str] = (
        "month", "day", "weekday", "hour", "minute")) -> DataFrame:
    """Calendar features (anomaly_detection.py:395-416). `weekday` matches
    python's Monday=0 convention (Spark's dayofweek is Sunday=1)."""
    col = F.col(ts)
    exprs = {
        "month": F.month(col),
        "day": F.dayofmonth(col),
        "weekday": ((F.dayofweek(col) + 5) % 7),
        "hour": F.hour(col),
        "minute": F.minute(col),
    }
    for name in which:
        df = df.withColumn(f"tf_{name}", exprs[name])
    return df


def time_average_features(df: DataFrame, keys, ts_seconds: str, value: str,
                          periods_s: Sequence[int],
                          prefix: str = "tavg_") -> DataFrame:
    """Trailing fixed-duration bucket means (anomaly_detection.py:418-452):
    for each period p seconds, the mean of values with timestamp in
    (t - p, t]. Event-time RANGE frames — no per-row Python, state O(frame)."""
    ts = F.col(ts_seconds)
    tsec = _epoch_seconds(df, ts)
    keys_l = keys if isinstance(keys, (list, tuple)) else [keys]
    for p in periods_s:
        w = (Window.partitionBy(*keys_l).orderBy(tsec)
             .rangeBetween(-(int(p) - 1), 0))
        df = df.withColumn(f"{prefix}{p}", F.avg(value).over(w))
    return df


def trend_classification_check(
    df: DataFrame, keys, order: str, value: str, *,
    N: int = 10, conv: int = 3, LL: float = -1.0, UL: float = 1.0,
    warning_stages: Sequence[float] = (), out: str = "code",
) -> DataFrame:
    """Trend-class check — the reference's Trend_Classification MLP
    (/root/reference/src/algorithms/trend_classification.py:106-193) is a
    classifier of up/flat/down ramps whose class prediction is convolved
    then border-checked; its decision function reduces to the sign of the
    local slope (SURVEY.md §2.4). Here: class_t = sign(regr_slope over
    last N), convolved with a ``conv``-wide rolling mean, border-checked.
    Pure window expressions."""
    w = _w(keys, order)
    rn = F.row_number().over(w)
    tx, tc, tv = f"_tc_x_{out}", f"_tc_cls_{out}", f"_tc_conv_{out}"
    dfx = df.withColumn(tx, rn.cast("double"))
    slope = F.expr(f"regr_slope({value}, {tx})").over(
        _w(keys, order).rowsBetween(-(N - 1), 0)
    )
    dfx = dfx.withColumn(tc, F.signum(slope))
    # materialize the convolution once (ladder references vn multiple
    # times — same buffer-dedup fix as hampel/welford/linear_fit);
    # out-suffixed temp names: collision-safe when chained twice
    dfx = dfx.withColumn(tv, F.avg(tc).over(
        _w(keys, order).rowsBetween(-(conv - 1), 0)))
    vn = 2.0 * (F.col(tv) - (UL + LL) / 2.0) / (UL - LL)
    code = F.when(rn < N + conv - 1, F.lit(UNDEFINED_CODE)).otherwise(
        ladder_code(vn, warning_stages)
    )
    return dfx.withColumn(out, code).drop(tx, tc, tv)


def percent_score_alicante(
    df: DataFrame, keys, ts_seconds, statuses: Sequence[str], *,
    interval: float, num_in_interval: int, out: str = "score",
) -> DataFrame:
    """PercentScore_Alicante (combination.py:221-265): identical to
    percent_score but only statuses whose TEXT contains 'upper' score
    (warnings 1, errors 2); others contribute 0."""
    ts = F.col(ts_seconds) if isinstance(ts_seconds, str) else ts_seconds
    tsec = _epoch_seconds(df, ts)
    per_row = sum(
        F.when(F.col(s).contains("upper") & F.col(s).startswith("Warning"), 1.0)
        .when(F.col(s).contains("upper") & F.col(s).startswith("Error"), 2.0)
        .otherwise(0.0)
        for s in statuses
    ) / (2.0 * len(statuses))
    keys_l = keys if isinstance(keys, (list, tuple)) else [keys]
    w = (
        Window.partitionBy(*keys_l).orderBy(tsec)
        .rangeBetween(-(int(interval) - 1), 0)
    )
    dfx = df.withColumn("_psa", per_row)
    conv = F.sum("_psa").over(w) / F.greatest(
        F.lit(float(num_in_interval)), F.count("_psa").over(w).cast("double")
    )
    return dfx.withColumn(out, conv).drop("_psa")
