"""F1 evaluation + grid search over a labeled synthetic series."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.evaluation import confusion, f1_score, grid_search
from anomaly_detection_spark.operators.windowed import welford_windowed


@pytest.fixture(scope="module")
def labeled(spark):
    """Random walk with planted labeled spikes."""
    rng = np.random.default_rng(9)
    vals = rng.normal(10, 1, 400)
    labels = np.zeros(400, dtype=int)
    for i in range(30, 400, 37):
        vals[i] += 15.0
        labels[i] = 1
    rows = [("s", float(i), float(v), int(l))
            for i, (v, l) in enumerate(zip(vals, labels))]
    return spark.createDataFrame(
        rows, "series string, ts double, value double, label int"
    ).cache()


def test_confusion_and_f1_exact(spark):
    rows = [("s", float(i), c, l) for i, (c, l) in enumerate(
        [(-1, 1), (-1, 1), (-1, 0), (1, 1), (1, 0), (2, 0)])]
    df = spark.createDataFrame(rows, "series string, ts double, code int, label int")
    c = confusion(df)
    assert c == {"tp": 2, "fp": 1, "fn": 1, "tn": 2}
    assert f1_score(df) == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))


def test_welford_detects_planted_spikes_with_good_f1(spark, labeled):
    scored = welford_windowed(labeled, "series", "ts", "value", N=20, X=4.0)
    f1 = f1_score(scored)
    assert f1 > 0.8


def test_grid_search_finds_better_X(spark, labeled):
    def builder(df, *, X):
        return welford_windowed(df, "series", "ts", "value", N=20, X=X)

    best, best_f1, allr = grid_search(
        labeled, builder, {"X": [0.5, 2.0, 4.0, 12.0]}
    )
    assert len(allr) == 4
    # X=0.5 flags everything (bad precision), X=12 flags nothing (bad
    # recall); a middle X must win
    assert best["X"] in (2.0, 4.0)
    assert best_f1 == max(f for _, f in allr)
    assert best_f1 > 0.8


def test_grid_search_parallel_matches_serial(spark, labeled):
    def builder(df, *, X):
        return welford_windowed(df, "series", "ts", "value", N=20, X=X)

    grid = {"X": [1.0, 3.0, 6.0]}
    _, f_serial, r_serial = grid_search(labeled, builder, grid)
    _, f_par, r_par = grid_search(labeled, builder, grid, parallelism=3)
    assert f_serial == f_par
    assert sorted((tuple(p.items()), f) for p, f in r_serial) == \
           sorted((tuple(p.items()), f) for p, f in r_par)


def test_grid_search_tunes_compiled_model_backed_detector(spark):
    """The eval harness composes with compile_detector over the
    model-backed algorithms (round-4 graduation): grid-search the GAN
    config's K on a labeled planted-spike series and the too-loose
    candidate must lose to a sensible one — the reference's
    GridSearchCV-over-AnomalyDetectorWrapper workflow end-to-end
    through the config surface."""
    import numpy as np
    from pyspark.sql import functions as F

    from anomaly_detection_spark.config import compile_detector
    from tests.conftest import series_df

    rng = np.random.default_rng(61)
    vals = [float(v) for v in rng.normal(10.0, 0.5, 120)]
    spikes = {30, 75, 110}
    for i in spikes:
        vals[i] = 60.0
    df = series_df(spark, vals).withColumn(
        "label", F.when(
            F.col("ts").isin([1459926000.0 + i * 3600.0 for i in spikes]),
            1).otherwise(0))

    def builder(d, *, K):
        t = compile_detector(
            "GAN()",
            {"train_conf": {"N_shifts": 0, "N_latent": 1, "K": K,
                            "len_window": 12}},
            keys="series", order="ts", value="value")
        return t(d)

    best, best_f1, allr = grid_search(df, builder, {"K": [4.0, 8.0, 1e6]})
    scores = {p["K"]: f for p, f in allr}
    assert scores[1e6] == 0.0           # threshold never exceeded
    assert best["K"] in (4.0, 8.0)
    assert best_f1 > 0.5
