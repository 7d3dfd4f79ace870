"""Extended operator coverage: EMA-percentile, periodic repair, as-of
join/band check, clustering distance check, PCA+iForest, time averages,
trend classification, Alicante percent-score."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.operators.asof import (
    asof_band_check,
    asof_join_backward,
)
from anomaly_detection_spark.operators.clustering import (
    clustering_check_broadcast,
    clustering_check_grouped,
)
from anomaly_detection_spark.operators.mvoutlier import pca_iforest_check
from anomaly_detection_spark.operators.sequential import (
    ema_percentile_check,
    periodic_last_n_average_repair,
)
from anomaly_detection_spark.operators.windowed import (
    percent_score_alicante,
    time_average_features,
    trend_classification_check,
)
from tests.conftest import codes_of, series_df


def test_ema_percentile_matches_pandas(spark):
    import pandas as pd

    vals = [10.0, 11, 10, 12, 11, 10, 50, 11, 10, 12, 11, 10, 11]
    df = series_df(spark, vals)
    out = ema_percentile_check(
        df, "series", "ts", "value", N=3, percentile=90.0, window=5,
    )
    got = {r["ts"]: (r["ema"], r["code"]) for r in out.collect()}
    ema = pd.Series(vals).ewm(alpha=0.5, adjust=False).mean()
    hi = ema.rolling(5).quantile(0.9, interpolation="linear")
    lo = ema.rolling(5).quantile(0.1, interpolation="linear")
    for i, ts in enumerate(sorted(got)):
        e, c = got[ts]
        assert e == pytest.approx(ema[i], rel=1e-12)
        if np.isnan(hi[i]):
            assert c == 2
        else:
            assert c == (-1 if (ema[i] > hi[i] or ema[i] < lo[i]) else 1)


def test_periodic_repair(spark):
    # value 900 at index 6 is out of [0, 100]; period=2, N=2 repair uses
    # repaired values at indices 4 and 2 -> mean(5.0, 3.0) = 4.0
    vals = [1.0, 2, 3, 4, 5, 6, 900, 8]
    df = series_df(spark, vals)
    out = periodic_last_n_average_repair(
        df, "series", "ts", "value", N=2, period=2, LL=0.0, UL=100.0,
    ).orderBy("ts").collect()
    assert [r["code"] for r in out] == [1, 1, 1, 1, 1, 1, -1, 1]
    assert out[6]["suggested_value"] == pytest.approx(4.0)


def test_asof_join_backward(spark):
    obs = spark.createDataFrame(
        [("u", 5.0, 1.0), ("u", 15.0, 2.0), ("u", 25.0, 3.0), ("u", 2.0, 9.0)],
        "k string, t double, v double",
    )
    bounds = spark.createDataFrame(
        [("u", 4.0, 0.0, 10.0), ("u", 20.0, 1.0, 2.5)],
        "k string, t double, lo double, hi double",
    )
    got = {r["t"]: (r["lo"], r["hi"]) for r in asof_join_backward(
        obs, bounds, on="t", keys=["k"], right_cols=["lo", "hi"]
    ).collect()}
    assert got[2.0] == (None, None)      # before any bound
    assert got[5.0] == (0.0, 10.0)
    assert got[15.0] == (0.0, 10.0)
    assert got[25.0] == (1.0, 2.5)

    checked = asof_band_check(
        obs, bounds, on="t", value="v", keys=["k"], lower="lo", upper="hi"
    )
    codes = {r["t"]: r["code"] for r in checked.collect()}
    assert codes == {2.0: 2, 5.0: 1, 15.0: 1, 25.0: -1}  # 3.0 > hi 2.5


def test_clustering_grouped_and_broadcast_agree(spark):
    rng = np.random.default_rng(6)
    rows = []
    # three tight clusters + two far outliers, one group
    for cx, cy in [(0, 0), (5, 5), (-5, 5)]:
        for x, y in rng.normal(0, 0.3, (30, 2)):
            rows.append(("g", len(rows), float(cx + x), float(cy + y)))
    rows.append(("g", len(rows), 50.0, 50.0))
    rows.append(("g", len(rows), -40.0, 0.0))
    df = spark.createDataFrame(rows, "grp string, rid long, fx double, fy double")
    grouped = clustering_check_grouped(
        df, "grp", ["fx", "fy"], eps=1.0, min_samples=5, treshold=3.0,
        extra_cols=["rid"],
    )
    flagged_g = {r["rid"] for r in grouped.filter("code = -1").collect()}
    assert flagged_g == {90, 91}
    broadcast = clustering_check_broadcast(
        spark, df, ["fx", "fy"], eps=1.0, min_samples=5, treshold=3.0,
        id_cols=["rid"],
    )
    flagged_b = {r["rid"] for r in broadcast.filter("code = -1").collect()}
    assert flagged_b == {90, 91}


def test_pca_iforest_flags_projected_outlier(spark):
    rng = np.random.default_rng(7)
    rows = []
    # points on a line y ~= x (1-D manifold in 2-D); outlier off-manifold
    for i, x in enumerate(rng.normal(0, 1, 300)):
        rows.append(("g", i, float(x), float(x + rng.normal(0, 0.05))))
    rows.append(("g", 300, 0.0, 8.0))
    df = spark.createDataFrame(rows, "grp string, rid long, fx double, fy double")
    out = pca_iforest_check(
        df, "grp", ["fx", "fy"], n_components=2, contamination=0.005,
        extra_cols=["rid"],
    )
    flagged = {r["rid"] for r in out.filter("code = -1").collect()}
    assert 300 in flagged and len(flagged) <= 5


def test_time_average_features(spark):
    df = series_df(spark, [1.0, 2, 3, 4], step=3600.0)  # hourly
    out = time_average_features(
        df, "series", "ts", "value", periods_s=[3600, 7200]
    ).orderBy("ts").collect()
    assert [r["tavg_3600"] for r in out] == [1.0, 2.0, 3.0, 4.0]
    assert [r["tavg_7200"] for r in out] == [1.0, 1.5, 2.5, 3.5]


def test_trend_classification_ladder(spark):
    up = list(range(20))
    df = series_df(spark, [float(v) for v in up])
    out = trend_classification_check(
        df, "series", "ts", "value", N=5, conv=3, LL=-1.0, UL=1.0,
        warning_stages=(0.5,),
    )
    codes = codes_of(out)
    assert all(c == 2 for c in codes[:6])          # warm-up N+conv-2
    # steady up-ramp: conv mean of sign = +1 -> vn = 1.0 -> not >1 -> warning
    assert all(c == 0 for c in codes[7:])


def test_percent_score_alicante_counts_only_upper(spark):
    from anomaly_detection_spark.codes import ladder_status, normalized

    vals = [50.0, 120.0, -30.0, 50.0]  # upper error, lower error
    df = series_df(spark, vals).withColumn(
        "status", ladder_status(normalized(F.col("value"), 0.0, 100.0), (0.9,))
    )
    out = percent_score_alicante(
        df, "series", "ts", ["status"], interval=86400, num_in_interval=2,
    ).orderBy("ts").collect()
    scores = [r["score"] for r in out]
    # only the 120.0 (above upper) contributes 2/2=1.0; denominator max(2, n)
    assert scores[0] == 0.0
    assert scores[1] == pytest.approx(0.5)   # 1.0 / max(2, 2)
    assert scores[2] == pytest.approx(1.0 / 3)
    assert scores[3] == pytest.approx(0.25)


def test_recon_drift_check_flags_off_manifold(spark):
    from anomaly_detection_spark.operators.mvoutlier import recon_drift_check

    rng = np.random.default_rng(21)
    rows = []
    for i, x in enumerate(rng.normal(0, 1, 300)):
        rows.append(("s", float(i), float(x), float(2 * x + rng.normal(0, 0.02))))
    rows.append(("s", 300.0, 0.0, 9.0))  # breaks the y=2x manifold
    rows.append(("s", 301.0, 1.0, 2.0))  # back on manifold
    df = spark.createDataFrame(rows, "series string, ts double, fx double, fy double")
    out = recon_drift_check(
        spark, df, "series", "ts", ["fx", "fy"], n_components=1,
        K=5.0, len_window=20,
    )
    rowsb = {r["ts"]: (r["recon_err"], r["code"]) for r in out.collect()}
    assert rowsb[300.0][1] == -1           # off-manifold spike flagged
    assert rowsb[301.0][1] == 1            # recovery OK
    flagged = [t for t, (_, c) in rowsb.items() if c == -1]
    assert len(flagged) <= 6               # few false positives


def test_codisp_check_flags_outlier(spark):
    from anomaly_detection_spark.operators.mvoutlier import codisp_check

    rng = np.random.default_rng(23)
    rows = [("g", i, float(x), float(y))
            for i, (x, y) in enumerate(rng.normal(0, 1, (400, 2)))]
    rows.append(("g", 400, 12.0, -12.0))
    df = spark.createDataFrame(rows, "grp string, rid int, fx double, fy double")
    out = codisp_check(df, "grp", ["fx", "fy"], threshold=30.0,
                       extra_cols=["rid"])
    rowsb = {r["rid"]: (r["codisp"], r["code"]) for r in out.collect()}
    assert rowsb[400][1] == -1
    flagged = [r for r, (_, c) in rowsb.items() if c == -1]
    assert len(flagged) <= 8
    # outlier's codisp dominates the bulk
    bulk = np.median([c for r, (c, _) in rowsb.items() if r != 400])
    assert rowsb[400][0] > 5 * bulk


def test_forecast_band_check_seasonal(spark):
    from anomaly_detection_spark.operators.forecast import forecast_band_check

    rng = np.random.default_rng(29)
    n, period = 240, 24.0
    t = np.arange(n, dtype=float)
    y = 10.0 + 0.01 * t + 3.0 * np.sin(2 * np.pi * t / period) \
        + rng.normal(0, 0.2, n)
    y[150] += 8.0  # break the seasonal pattern
    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(y)],
        "series string, ts double, value double",
    )
    out = forecast_band_check(df, "series", "ts", "value",
                              period=period, harmonics=2, z=4.0)
    codes = {r["ts"]: r["code"] for r in out.collect()}
    assert codes[150.0] == -1
    flagged = [t_ for t_, c in codes.items() if c == -1]
    assert len(flagged) <= 5  # seasonal swing itself is NOT flagged


def test_forecast_changepoint_trend(spark):
    """Prophet's piecewise-linear trend (hinge basis + ridge-shrunk
    slope deltas, Taylor & Letham 2018 eq. 4): a tent-shaped trend that
    a straight line cannot follow fits tightly with changepoints — the
    residual band shrinks by >2x — and a planted off-band spike still
    flags without the slope break flooding errors. n_changepoints=0
    keeps the original OLS numerics (existing seasonal test covers it)."""
    from anomaly_detection_spark.operators.forecast import (
        forecast_band_check, seasonal_forecast,
    )

    rng = np.random.default_rng(33)
    n, period = 240, 24.0
    t = np.arange(n, dtype=float)
    trend = np.where(t < 120.0, 10.0 + 0.08 * t,
                     10.0 + 0.08 * 120.0 - 0.08 * (t - 120.0))
    y = trend + 2.0 * np.sin(2 * np.pi * t / period) \
        + rng.normal(0, 0.15, n)
    y[200] += 6.0
    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(y)],
        "series string, ts double, value double",
    )
    kw = dict(period=period, harmonics=2, z=4.0)
    flat = seasonal_forecast(df, "series", "ts", "value", **kw).toPandas()
    pw = seasonal_forecast(df, "series", "ts", "value",
                           n_changepoints=10, **kw).toPandas()

    def half_band(p):
        return float((p.yhat_upper - p.yhat).iloc[0])

    assert half_band(pw) < 0.5 * half_band(flat)
    out = forecast_band_check(df, "series", "ts", "value",
                              n_changepoints=10, **kw)
    codes = {r["ts"]: r["code"] for r in out.collect()}
    assert codes[200.0] == -1
    assert sum(1 for c in codes.values() if c == -1) <= 5

    # rank-deficient design stays finite with changepoints: period 1.0
    # on integer timestamps aliases every harmonic (sin == 0, cos ==
    # intercept); the augmented lstsq must neither raise nor explode
    alias = seasonal_forecast(df, "series", "ts", "value", period=1.0,
                              harmonics=2, z=4.0, n_changepoints=5)
    ap = alias.toPandas()
    assert np.isfinite(ap.yhat).all()
    assert float(ap.yhat_upper.iloc[0] - ap.yhat.iloc[0]) < 100.0


def test_sequential_bucketing_handles_hot_series(spark):
    """One series with 30k rows among 500 tiny series: the bucketed
    applyInPandas path must stay correct (hot series confined to one
    bucket, verdicts equal an isolated run) and the task count stays at
    the bucket bound, not the series count."""
    from anomaly_detection_spark.operators.sequential import ema_check

    rng = np.random.default_rng(31)
    rows = [("hot", float(i), float(v))
            for i, v in enumerate(np.cumsum(rng.normal(0, 1, 30_000)) + 50)]
    for s in range(500):
        for i, v in enumerate(rng.normal(50, 1, 5)):
            rows.append((f"cold{s}", float(i), float(v)))
    df = spark.createDataFrame(rows, "series string, ts double, value double")
    out = ema_check(df, "series", "ts", "value", N=9, LL=0.0, UL=100.0,
                    warning_stages=(0.9,))
    assert out.count() == len(rows)
    hot_mixed = {r["ts"]: r["code"]
                 for r in out.filter("series = 'hot'").collect()}
    solo = ema_check(
        spark.createDataFrame([r for r in rows if r[0] == "hot"],
                              "series string, ts double, value double"),
        "series", "ts", "value", N=9, LL=0.0, UL=100.0,
        warning_stages=(0.9,),
    )
    hot_solo = {r["ts"]: r["code"] for r in solo.collect()}
    assert hot_mixed == hot_solo


def test_z_for_interval_matches_normal_quantiles():
    from anomaly_detection_spark.operators.forecast import _z_for_interval

    for width, z in ((0.95, 1.959964), (0.99, 2.575829),
                     (0.6826895, 1.0), (0.5, 0.674490)):
        assert _z_for_interval(width) == pytest.approx(z, abs=1e-5)


def _prophet_loop_expected(t, y, *, first, S, R, fitkw):
    """Independent transcription of fb_Prophet's detector loop
    (fb_prophet.py:74-199): row p is Undefined until min_samples history
    exists; then it is checked against the model trained at the most
    recent boundary b on the trailing max_samples rows."""
    from anomaly_detection_spark.operators.forecast import _fit_predict_band

    n = len(y)
    codes = []
    for p in range(n):
        if p < first:
            codes.append(2)
            continue
        b = first + ((p - first) // R) * R
        fit = _fit_predict_band(t[max(0, b - S):b], y[max(0, b - S):b],
                                t[p:p + 1], **fitkw)
        if fit is None:
            codes.append(2)
            continue
        yh, bw = fit
        codes.append(-1 if (y[p] < yh[0] - bw or y[p] > yh[0] + bw) else 1)
    return codes


def test_forecast_retrain_matches_reference_loop_both_paths(spark):
    """Epoch-parallel (S/R <= 32) and sequential (S/R > 32) regimes both
    reproduce the reference detector loop element-exactly."""
    from anomaly_detection_spark.operators.forecast import (
        _z_for_interval, forecast_retrain_check,
    )

    rng = np.random.default_rng(41)
    n, period = 150, 24.0
    t = np.arange(n, dtype=float)
    y = 10.0 + 0.02 * t + 2.0 * np.sin(2 * np.pi * t / period) \
        + rng.normal(0, 0.15, n)
    y[100] += 5.0
    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(y)],
        "series string, ts double, value double")

    for min_s, max_s, R in ((40, 60, 10),   # S/R = 6  -> epoch-parallel
                            (40, 60, 1)):   # S/R = 60 -> sequential
        out = forecast_retrain_check(
            df, "series", "ts", "value", min_samples=min_s,
            max_samples=max_s, retrain_interval=R, period=period,
            harmonics=2, uncertainty_interval=0.99,
        ).toPandas().sort_values("ts")
        fitkw = dict(period=period, harmonics=2, n_changepoints=0,
                     changepoint_range=0.8, changepoint_ridge=1.0,
                     z=_z_for_interval(0.99))
        expect = _prophet_loop_expected(t, y, first=min_s, S=max_s, R=R,
                                        fitkw=fitkw)
        assert out.code.tolist() == expect, (min_s, max_s, R)
        assert out.code.tolist()[100] == -1
        # epoch counts retrains like the reference's retrain_counter
        assert out.epoch.tolist()[:min_s] == [0] * min_s
        assert out.epoch.iloc[-1] == (n - 1 - min_s) // R + 1


def test_forecast_retrain_adapts_to_regime_change(spark):
    """The retrain-flip: after a level shift the OLD model flags the new
    level, and once the trailing-history retrains absorb it the verdicts
    recover to OK — the reference's rolling-memory semantics
    (fb_prophet.py:148-151: memory trimmed to max_samples)."""
    from anomaly_detection_spark.operators.forecast import (
        forecast_retrain_check,
    )

    rng = np.random.default_rng(43)
    period = 24.0
    t = np.arange(160, dtype=float)
    level = np.where(t < 80, 10.0, 30.0)
    y = level + 2.0 * np.sin(2 * np.pi * t / period) \
        + rng.normal(0, 0.2, 160)
    df = spark.createDataFrame(
        [("s", float(i), float(v)) for i, v in enumerate(y)],
        "series string, ts double, value double")
    out = forecast_retrain_check(
        df, "series", "ts", "value", min_samples=40, max_samples=40,
        retrain_interval=10, period=period, harmonics=2,
        uncertainty_interval=0.99,
    ).toPandas().sort_values("ts")
    codes = out.code.tolist()
    assert all(c == 2 for c in codes[:40])
    # a 0.99 band leaves ~1% noise flags; the structural claim is the
    # FLIP: settled before, solidly flagged at the shift, settled after
    assert codes[45:80].count(-1) <= 2       # settled pre-break
    assert set(codes[80:90]) == {-1}         # old model flags the shift
    assert codes[130:].count(-1) <= 2        # memory fully post-break
    assert codes[130:].count(1) >= 25


def test_z_for_interval_rejects_bad_width():
    from anomaly_detection_spark.operators.forecast import _z_for_interval

    for bad in (0.0, -0.5, 1.0, 1.5):
        with pytest.raises(ValueError):
            _z_for_interval(bad)


def test_forecast_retrain_value_in_extras_both_paths(spark):
    """extra_cols=('value',) (the forecast_band_check pattern) must work
    in BOTH execution regimes — the epoch-parallel path previously
    selected the value column twice and broke on the ambiguous
    reference."""
    from anomaly_detection_spark.operators.forecast import (
        forecast_retrain_check,
    )

    rng = np.random.default_rng(51)
    vals = [float(10 + np.sin(i / 3.0) + rng.normal(0, 0.1))
            for i in range(80)]
    df = series_df(spark, vals)
    for R in (10, 1):  # epoch-parallel / sequential
        plain = forecast_retrain_check(
            df, "series", "ts", "value", min_samples=30, max_samples=40,
            retrain_interval=R, period=6 * np.pi * 3600.0,
        ).toPandas().sort_values("ts")
        extra = forecast_retrain_check(
            df, "series", "ts", "value", min_samples=30, max_samples=40,
            retrain_interval=R, period=6 * np.pi * 3600.0,
            extra_cols=("value",),
        ).toPandas().sort_values("ts")
        assert "value" in extra.columns
        assert extra.code.tolist() == plain.code.tolist(), R
