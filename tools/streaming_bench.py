"""Structured-Streaming micro-batch throughput bench.

Measures rows/s through four representative streaming pipelines over a
file source split into multiple micro-batches (maxFilesPerTrigger +
availableNow), each ending in a noop sink with a checkpoint:

1. stateless  — constraint-code expressions + sink filter (pure codegen)
2. windowed   — watermark + 1-minute windowed error rates (state store)
3. stateful   — streaming Welford via applyInPandasWithState (per-key
                pickled state carried across micro-batches)
4. neural     — streaming GAN (pre-trained autoencoder, per-key
                error-window state, GEMM scoring per micro-batch)

Prints one JSON line. Evidence recorded in BENCH/BASELINE.md.

    python tools/streaming_bench.py [--rows 2000000] [--files 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--files", type=int, default=16)
    p.add_argument("--files-per-trigger", type=int, default=2)
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--keys", type=int, default=64)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from anomaly_detection_spark.session import get_spark

    spark = get_spark("stream-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    base = "/tmp/streaming_bench"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    schema = "key string, order double, value double, ts timestamp"
    (
        spark.range(args.rows)
        .select(
            (F.col("id") % args.keys).cast("string").alias("key"),
            F.col("id").cast("double").alias("order"),
            (F.sin(F.col("id") / 97.0) * 10 + 20
             + F.when(F.col("id") % 100_001 == 0, 500.0).otherwise(0.0)
             ).alias("value"),
            (F.lit("2026-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.col("id") / 1000.0)).alias("ts"),
        )
        .repartition(args.files)
        .write.mode("overwrite").parquet(src)
    )

    def run(name, build):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", args.files_per_trigger)
                  .parquet(src))
        out = build(stream)
        ckpt = f"{base}/ckpt_{name}"
        t0 = time.time()
        q = (out.writeStream.format("noop")
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0
        batches = len([pr for pr in q.recentProgress
                       if pr and pr.get("numInputRows", 0) > 0])
        return {"wall_s": round(wall, 2),
                "rows_per_s": round(args.rows / wall, 1),
                "micro_batches": batches}

    def stateless(stream):
        from anomaly_detection_spark.streaming.stream import (
            sink_filter, with_constraint_codes,
        )

        checked = with_constraint_codes(stream, {
            "c_value_border": F.when(F.col("value") > 400, -1)
            .when(F.col("value") > 35, 0).otherwise(1),
            "c_key_domain": F.when(F.col("key").isNotNull(), 1).otherwise(-1),
        })
        return sink_filter(checked, send_ok=False,
                           code_col="c_value_border")

    def windowed(stream):
        from anomaly_detection_spark.streaming.stream import (
            windowed_error_rates, with_constraint_codes,
        )

        checked = with_constraint_codes(stream, {
            "c_value_border": F.when(F.col("value") > 400, -1)
            .when(F.col("value") > 35, 0).otherwise(1),
        })
        return windowed_error_rates(checked, ts_col="ts",
                                    code_cols=["c_value_border"],
                                    window="1 minute", watermark="2 minutes")

    def stateful(stream):
        from anomaly_detection_spark.streaming.stateful import (
            streaming_welford_check,
        )

        return streaming_welford_check(stream, X=3.0)

    def neural(stream):
        # streaming GAN: one pre-trained autoencoder (driver fit on a
        # sample of the same value distribution), per-key error-window
        # state, GEMM scoring per micro-batch
        import numpy as np

        from anomaly_detection_spark.operators.neural import (
            fit_autoencoder,
        )
        from anomaly_detection_spark.streaming.stateful import (
            streaming_gan_check,
        )

        ids = np.arange(0, args.rows, max(1, args.rows // 4096))[:4096]
        Xs = (np.sin(ids / 97.0) * 10 + 20)[:, None]
        mn, mx = float(Xs.min()), float(Xs.max())
        av = (mn + mx) / 2.0
        w, a, _ = fit_autoencoder((Xs - av) / (mx - mn), 1, seed=0)
        return streaming_gan_check(stream, ["value"],
                                   model=(mn, mx, av, w, a),
                                   K=4.0, len_window=20)

    results = {
        "stateless": run("stateless", stateless),
        "windowed": run("windowed", windowed),
        "stateful": run("stateful", stateful),
        "neural": run("neural", neural),
    }
    print(json.dumps({
        "bench": "streaming_microbatch_throughput", "rows": args.rows,
        "files": args.files, "files_per_trigger": args.files_per_trigger,
        "keys": args.keys, "cores": args.cores, "pipelines": results,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
