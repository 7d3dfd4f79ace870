"""RRCF hot-series throughput bench: the one operator where the "zero
per-row Python" rule is waived (operators/rrcf.py — each verdict depends
on trees built from all prior points of its series, the published
structure has no vectorized form), so a single pathological series is
bounded by one core's kernel throughput. This tool measures that bound:

1. kernel-only points/s (no Spark): one long series through RRCFStream
   at dim 1 and dim 4 — the transferable single-core number;
2. the same series through the full rrcf_stream_check Spark path
   (one series -> one task, so wall ~= kernel wall + job overhead);
3. the stride mitigation: stride=4 on the same series (wall / ~4,
   skipped rows Undefined).

Usage: python tools/rrcf_bench.py [--points 1000000] [--spark-points 250000]
Prints one JSON object; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_series(n: int, dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(0.0, 1.0, (n, dim)), axis=0)
    # sprinkle spikes so the trees see real separations, not one blob
    hot = rng.integers(0, n, max(4, n // 10_000))
    x[hot] += rng.choice([-40.0, 40.0], size=(len(hot), dim))
    return x


def kernel_points_per_s(n: int, dim: int, *, num_trees=10, tree_size=128):
    from anomaly_detection_spark.operators.rrcf import RRCFStream

    rows = gen_series(n, dim).tolist()
    stream = RRCFStream(num_trees, tree_size, seed=0)
    t0 = time.perf_counter()
    score = stream.insert_score
    for r in rows:
        score(r)
    wall = time.perf_counter() - t0
    return {"points": n, "dim": dim, "wall_s": round(wall, 2),
            "points_per_s": round(n / wall)}


def spark_single_series(spark, n: int, *, stride: int):
    from anomaly_detection_spark.operators.rrcf import rrcf_stream_check

    x = gen_series(n, 1)
    pdf_rows = [("hot", float(i), float(x[i, 0])) for i in range(n)]
    df = spark.createDataFrame(pdf_rows,
                               "series string, ts double, value double")
    df = df.repartition(1).cache()
    df.count()  # isolate kernel wall from data-gen
    t0 = time.perf_counter()
    out = rrcf_stream_check(df, "series", "ts", ["value"], stride=stride)
    n_def = out.filter("code != 2").count()
    wall = time.perf_counter() - t0
    df.unpersist()
    return {"points": n, "stride": stride, "wall_s": round(wall, 2),
            "points_per_s": round(n / wall), "scored_rows": n_def}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--spark-points", type=int, default=250_000)
    args = ap.parse_args()

    res = {"kernel": [kernel_points_per_s(args.points, 1),
                      kernel_points_per_s(args.points // 4, 4)]}

    from anomaly_detection_spark.session import get_spark

    spark = get_spark("rrcf-bench", cores=8, shuffle_partitions=8)
    try:
        res["spark_single_series"] = [
            spark_single_series(spark, args.spark_points, stride=1),
            spark_single_series(spark, args.spark_points, stride=4),
        ]
    finally:
        spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
