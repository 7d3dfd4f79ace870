"""Structured Streaming front-end for the check suite.

The reference consumes an unbounded Kafka stream row-by-row
(/root/reference/src/consumer.py:164-191). The engine's streaming mode is
the same declarative pipeline as batch — the constraint Column
expressions are stream-agnostic — wired into readStream/writeStream:

    source (kafka/file/rate) -> constraint codes -> [watermark + windowed
    error aggregation] -> sink (kafka/parquet/memory/foreachBatch)

Warm-up gating ("Undefined until N samples", anomaly_detection.py:298-301)
and the rolling detectors map to watermarked event-time windows here;
exact sequential recurrences (EMA et al.) stay in the batch engine or in
foreachBatch micro-batches, which is where Spark puts per-key ordered
state anyway.

No Kafka broker exists in the sandbox; the file source exercises the
identical plan (tests stream parquet directories through it).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_source(
    spark: SparkSession, *, path: str | None = None, schema=None,
    kafka_servers: str | None = None, topic: str | None = None,
    fmt: str = "parquet",
):
    """readStream from a directory (sandbox/test) or Kafka (production).
    Kafka values are JSON messages {"ftr_vector": [...], "timestamp": ...}
    per the reference's wire format (README.md:97-103)."""
    if kafka_servers:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", kafka_servers)
            .option("subscribe", topic)
            .load()
        )
        return raw.select(
            F.from_json(F.col("value").cast("string"), schema).alias("j")
        ).select("j.*")
    return spark.readStream.format(fmt).schema(schema).load(path)


def with_constraint_codes(stream_df: DataFrame, code_exprs: dict) -> DataFrame:
    """Attach named check-code columns — identical expressions to batch."""
    out = stream_df
    for name, expr in code_exprs.items():
        out = out.withColumn(name, expr)
    return out


def windowed_error_rates(
    checked: DataFrame, *, ts_col: str, code_cols: Sequence[str],
    window: str = "1 minute", watermark: str = "2 minutes",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Watermarked event-time windowed verdict aggregation: per window
    (and optional keys), row count plus error/warning counts per check.
    Late rows beyond the watermark are dropped by Spark's state cleanup —
    the streaming analogue of the reference's memory trimming."""
    err = sum(F.when(F.col(c) == -1, 1).otherwise(0) for c in code_cols)
    warn = sum(F.when(F.col(c) == 0, 1).otherwise(0) for c in code_cols)
    return (
        checked.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(err).alias("n_error"),
            F.sum(warn).alias("n_warning"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            *keys, "n", "n_error", "n_warning",
        )
    )


def run_to_memory(result: DataFrame, name: str, *, mode: str = "append"):
    """Test/debug sink: writeStream into an in-memory table; returns the
    query (caller calls processAllAvailable() / stop())."""
    return (
        result.writeStream.format("memory")
        .queryName(name).outputMode(mode).start()
    )


def run_foreach_batch(result: DataFrame, fn, checkpoint: str):
    """Production sink shape: micro-batch handler with checkpointing —
    resume-on-restart comes from Spark's own checkpoint here (the batch
    engine's audit ledger covers the batch path)."""
    return (
        result.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .start()
    )
