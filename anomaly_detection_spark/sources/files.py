"""Readers for the reference's file formats, mapped to the engine's
message shape ``(ts timestamp, ftr_vector array<double>, ...)``.

Reference formats (/root/reference/src/consumer.py:276-363):
  * CSV with header ``timestamp`` + one column per vector component;
    optional ``label``/``labelInfo`` columns are dropped on ingest
    (consumer.py:303) — the closest thing the reference has to column
    pruning, which here is a real pruned scan.
  * JSON of shape ``{"data": [{"timestamp": ..., "ftr_vector": [...]},
    ...]}`` (consumer.py:333-363).
  * timestamps in unix seconds, or milliseconds when > 1e10
    (anomaly_detection.py:291-294).

Everything is a plain ``spark.read`` — schema inference off, explicit
types, distributed parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _promote_ts(col):
    """Unix seconds, or milliseconds when > 1e10 (reference heuristic)."""
    secs = F.when(col > 1e10, col / 1000.0).otherwise(col)
    return F.timestamp_seconds(secs)


def read_reference_csv(
    spark: SparkSession, path: str, *, series_key: str = "series",
) -> DataFrame:
    """CSV (timestamp, v0, v1, ..., [label, labelInfo]) ->
    (series, ts, ftr_vector, value). ``value`` = first component, the
    column the single-feature detectors check. Label columns never enter
    the plan (explicit projection = column pruning at the scan)."""
    raw = spark.read.option("header", True).csv(path)
    value_cols = [c for c in raw.columns
                  if c not in ("timestamp", "label", "labelInfo")]
    vec = F.array(*[F.col(c).cast("double") for c in value_cols])
    return raw.select(
        F.lit(path).alias(series_key),
        _promote_ts(F.col("timestamp").cast("double")).alias("ts"),
        vec.alias("ftr_vector"),
        F.col(value_cols[0]).cast("double").alias("value"),
    )


def read_reference_json(
    spark: SparkSession, path: str, *, series_key: str = "series",
) -> DataFrame:
    """JSON {"data": [{"timestamp": ..., "ftr_vector": [...]}]} ->
    (series, ts, ftr_vector, value)."""
    raw = spark.read.option("multiLine", True).json(path)
    rows = raw.select(F.explode("data").alias("r"))
    return rows.select(
        F.lit(path).alias(series_key),
        _promote_ts(F.col("r.timestamp").cast("double")).alias("ts"),
        F.col("r.ftr_vector").cast("array<double>").alias("ftr_vector"),
        F.element_at(F.col("r.ftr_vector").cast("array<double>"), 1)
        .alias("value"),
    )
