"""Skew-stress bench: Zipf-imbalanced inputs through the operators whose
scale story depends on hot-key handling — epoch-parallel rolling retrain
(hot series), MinHash near-dup (viral boilerplate -> hot LSH bucket) and
the curation pipeline — with wall times AND per-stage task-time
distributions (p50/p95/max from the Spark status REST API), so the
"caps hold under imbalance" claim is evidenced by task histograms, not
just wall clocks.

Usage: python tools/skew_bench.py [--rows 2000000] [--docs 120000]
Prints one JSON object; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _completed_stages(spark) -> list:
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages"
        f"?status=complete&withSummaries=true&quantiles=0.5,0.95,1.0"))


def max_stage_id(spark) -> int:
    """Marker so task_time_stats only considers stages submitted AFTER
    this point — the REST stage history is append-only per app, and the
    heaviest stage of a whole session can belong to an earlier workload
    (e.g. the data-gen write)."""
    stages = _completed_stages(spark)
    return max((s["stageId"] for s in stages), default=-1)


def task_time_stats(spark, since_stage: int = -1,
                    min_task_ms: float = 50.0) -> dict:
    """p50/p95/max executor run time of the heaviest completed stage
    with stageId > since_stage, via the status REST API."""
    best = None
    for s in _completed_stages(spark):
        if s["stageId"] <= since_stage:
            continue
        d = s.get("taskMetricsDistributions")
        if not d:
            continue
        rt = d["executorRunTime"]
        if rt[-1] < min_task_ms:
            continue
        if best is None or rt[-1] > best["max_ms"]:
            best = {
                "stage": s["stageId"], "n_tasks": s["numCompleteTasks"],
                "p50_ms": rt[0], "p95_ms": rt[1], "max_ms": rt[2],
                "p95_over_p50": round(rt[1] / max(rt[0], 1e-9), 2),
                "max_over_p50": round(rt[2] / max(rt[0], 1e-9), 2),
            }
    return best or {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--docs", type=int, default=120_000)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from anomaly_detection_spark.session import get_spark

    results: dict = {"rows": args.rows, "docs": args.docs,
                     "cores": args.cores}

    # ---- 1. hot-series rolling retrain -------------------------------
    spark = get_spark("skew-retrain", cores=args.cores,
                      shuffle_partitions=args.cores,
                      extra_conf={"spark.ui.enabled": "true"})
    from anomaly_detection_spark.operators.clustering import (
        clustering_retrain_check,
    )

    # Zipf-ish key: floor(1/u) capped — key 1 takes ~50% of rows, key k
    # ~1/k(k+1); with 2M rows the hottest/median-key imbalance is >6000x
    u = F.rand(seed=7)
    ev = (
        spark.range(args.rows)
        .withColumn("series", F.least(F.floor(1.0 / (1.0 - u)), F.lit(1000))
                    .cast("string"))
        .withColumn("ts", F.col("id").cast("double"))
        .withColumn("f1", F.sin(F.col("id").cast("double") / 97.0) * 50.0
                    + F.rand(seed=1) * 10.0)
        .withColumn("f2", F.cos(F.col("id").cast("double") / 101.0) * 50.0
                    + F.rand(seed=2) * 10.0)
        .select("series", "ts", "f1", "f2")
    )
    ev.write.mode("overwrite").parquet("/tmp/skew_events")
    ev = spark.read.parquet("/tmp/skew_events")
    counts = ev.groupBy("series").count()
    top = counts.orderBy(F.desc("count")).first()["count"]
    med = counts.approxQuantile("count", [0.5], 0.0)[0]
    results["retrain_imbalance_hot_over_median"] = round(top / med, 1)

    mark = max_stage_id(spark)
    t0 = time.time()
    clustering_retrain_check(
        ev, "series", "ts", ["f1", "f2"],
        eps=8.0, min_samples=4, treshold=20.0,
        retrain_interval=2000, samples_for_retrain=4000,
    ).write.format("noop").mode("overwrite").save()
    results["retrain_wall_s"] = round(time.time() - t0, 2)
    results["retrain_tasks"] = task_time_stats(spark, mark)
    spark.stop()

    # ---- 2. viral-boilerplate minhash + curation ---------------------
    spark = get_spark("skew-dedup", cores=args.cores,
                      shuffle_partitions=args.cores,
                      extra_conf={"spark.ui.enabled": "true"})
    from anomaly_detection_spark.functions.dedup import minhash_lsh_pairs

    viral = ("All rights reserved. Redistribution and use in source and "
             "binary forms, with or without modification, are permitted "
             "provided that the conditions are met. ")
    docs = (
        spark.range(args.docs)
        .withColumn("doc_id", F.col("id"))
        .withColumn(
            "text",
            F.when(
                F.col("id") % 20 == 0,        # 5% of the corpus is viral
                F.concat(F.lit(viral), (F.col("id") % 7).cast("string")),
            ).when(
                F.col("id") % 997 == 1,       # small dup groups (~size 40)
                F.concat(F.lit("legit near-duplicate notice variant "),
                         (F.col("id") % 3).cast("string")),
            ).otherwise(
                F.concat(
                    F.lit("commit "), F.sha2(F.col("id").cast("string"), 256),
                    F.lit(" refactors module "),
                    F.sha2((F.col("id") + 1).cast("string"), 256),
                )
            ),
        )
        .select("doc_id", "text")
    )
    docs.write.mode("overwrite").parquet("/tmp/skew_docs")
    docs = spark.read.parquet("/tmp/skew_docs")

    mark = max_stage_id(spark)
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, "doc_id", "text",
                              jaccard_threshold=0.7, eager=True)
    n_pairs = pairs.count()
    results["minhash_wall_s"] = round(time.time() - t0, 2)
    results["minhash_pairs"] = n_pairs
    results["minhash_tasks"] = task_time_stats(spark, mark)
    # the viral bucket (6k docs per variant) exceeds max_bucket=64 and is
    # dropped: without the cap it alone would emit ~7 * C(6000,2) ~ 1.3e8
    # candidate pairs
    results["minhash_hot_bucket_capped"] = n_pairs < 1_000_000

    from anomaly_detection_spark.functions.curation import (
        CurationConfig, curate,
    )

    mark = max_stage_id(spark)
    t0 = time.time()
    curated, report = curate(
        docs.withColumn("lang", F.lit("en")),
        config=CurationConfig(min_quality=0.0, min_tokens=1,
                              jaccard_threshold=0.7),
    )
    curated.write.format("noop").mode("overwrite").save()
    stages = {r[0]: (r[1], r[2]) for r in report.rows()}
    results["curation_wall_s"] = round(time.time() - t0, 2)
    results["curation_stages"] = stages
    results["curation_tasks"] = task_time_stats(spark, mark)
    spark.stop()

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
