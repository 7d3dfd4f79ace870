"""End-to-end on the reference's OWN benchmark dataset (data/ads-1.csv,
31,416 labeled rows — its largest checked-in workload): the engine's
verdicts must equal the reference detector's element-wise on all 31k
rows, and the labeled-F1 evaluation pipeline must run over it.

Skipped when the reference checkout is absent (repo stays standalone).
"""

import os

import pytest
from pyspark.sql import functions as F

ADS = "/root/reference/data/ads-1.csv"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(ADS), reason="reference dataset not available",
)


@pytest.fixture(scope="module")
def ads(spark):
    """ads-1.csv -> (series, ts-ordinal, value, label). The file's
    'ftr_vector' column is a plain float here; timestamps are synthetic
    0.01-step ordinals, used directly as the order column."""
    raw = spark.read.option("header", True).csv(ADS)
    return raw.select(
        F.lit("ads1").alias("series"),
        F.col("timestamp").cast("double").alias("ts"),
        F.col("ftr_vector").cast("double").alias("value"),
        (F.col("label") == "True").cast("int").alias("label"),
    ).cache()


def _ref_detector(module, cls, conf):
    import importlib
    import sys
    import types

    stubs = {}
    for name in ["kafka", "influxdb_client", "influxdb_client.client",
                 "influxdb_client.client.write_api", "matplotlib",
                 "matplotlib.pyplot", "requests"]:
        stubs[name] = types.ModuleType(name)
    stubs["kafka"].KafkaProducer = object
    stubs["influxdb_client"].InfluxDBClient = object
    stubs["influxdb_client.client.write_api"].SYNCHRONOUS = None
    stubs["influxdb_client.client.write_api"].ASYNCHRONOUS = None

    class _A:
        def __getattr__(self, _):
            return _A()

        def __call__(self, *a, **k):
            return _A()

    stubs["matplotlib.pyplot"].style = _A()
    stubs["matplotlib"].pyplot = stubs["matplotlib.pyplot"]
    saved = {n: sys.modules.get(n) for n in stubs}
    sys.modules.update(stubs)
    sys.path.insert(0, "/root/reference/src")
    try:
        det = getattr(importlib.import_module(module), cls)()
        base = {"input_vector_size": 1, "warning_stages": [],
                "filtering": "None", "output": [], "output_conf": [{}]}
        base.update(conf)
        det.configure(base)
        return det, saved
    except Exception:
        for n, m in saved.items():
            if m is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = m
        raise


def _run_ref_on_rows(det, saved, rows):
    import sys
    try:
        codes = []
        for r in rows:
            det.message_insert({"ftr_vector": [r["value"]],
                                "timestamp": 1459926000.0 + r["ts"] * 100})
            codes.append(det.status_code)
        return codes
    finally:
        sys.path.remove("/root/reference/src")
        for n, m in saved.items():
            if m is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = m


def test_engine_matches_reference_on_ads1(spark, ads):
    """31,416 real rows through Welford(N=30): engine verdict sequence ==
    the reference detector's, element-wise."""
    det, saved = _ref_detector("algorithms.welford", "Welford",
                               {"N": 30, "X": 3.0})
    ref_codes = _run_ref_on_rows(det, saved, ads.orderBy("ts").collect())

    from anomaly_detection_spark.operators.windowed import welford_windowed

    out = welford_windowed(ads, "series", "ts", "value", N=30, X=3.0)
    mine = [r["code"] for r in out.orderBy("ts").collect()]
    assert len(mine) == 31_416
    assert mine == ref_codes
    assert -1 in mine  # the dataset's anomalies are actually flagged


def test_labeled_f1_pipeline_on_ads1(spark, ads):
    """The reference's Test/GridSearchCV workflow shape on its own data:
    grid-search Welford X by F1 against the shipped labels."""
    from anomaly_detection_spark.evaluation import f1_score, grid_search
    from anomaly_detection_spark.operators.windowed import welford_windowed

    def builder(df, *, X):
        return welford_windowed(df, "series", "ts", "value", N=30, X=X)

    best, best_f1, results = grid_search(
        ads, builder, {"X": [2.0, 4.0, 8.0]}, parallelism=3,
    )
    assert len(results) == 3
    assert 0.0 <= best_f1 <= 1.0
    assert best_f1 == max(f for _, f in results)
    # the detector finds SOMETHING on the labeled anomalies
    scored = builder(ads, X=best["X"])
    assert scored.filter("code = -1").count() > 0
    assert f1_score(scored) == pytest.approx(best_f1)


def test_ema_matches_reference_on_ads1(spark, ads):
    """Same 31,416 real rows through the EMA drift check."""
    det, saved = _ref_detector(
        "algorithms.ema", "EMA",
        {"N": 30, "UL": 1.0, "LL": -0.2, "warning_stages": [0.9]},
    )
    ref_codes = _run_ref_on_rows(det, saved, ads.orderBy("ts").collect())

    from anomaly_detection_spark.operators.sequential import ema_check

    out = ema_check(ads, "series", "ts", "value", N=30, LL=-0.2, UL=1.0,
                    warning_stages=(0.9,))
    mine = [r["code"] for r in out.orderBy("ts").collect()]
    assert mine == ref_codes
