"""SparkSession factory tuned for this engine.

Local-mode knobs mirror what a real cluster submit would set via
``spark-submit --py-files`` (see engine docs): AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (every pandas UDF
crosses the JVM<->Python boundary in columnar batches), shuffle
partitions sized to the core count rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "anomaly_detection_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table (see /root/repo/TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def shuffle_partitions(spark: SparkSession) -> int:
    """spark.sql.shuffle.partitions as an int, tolerating platforms that
    set it to a non-numeric value ('auto' under auto-optimized shuffle):
    the fan-out pins only need a sane upper bound, so fall back to the
    cluster's default parallelism there."""
    v = spark.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return int(v)
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism
