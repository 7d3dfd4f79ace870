"""spark-submit entry point: run the flagship validation suite over a
code corpus with audit/resume, emitting throughput JSON.

Cluster:  spark-submit --py-files anomaly_detection_spark.zip \
              -m anomaly_detection_spark.run -- \
              --input /path/to/iceberg_or_parquet --audit /path/audit ...
Sandbox:  python -m anomaly_detection_spark.run --rows 200000

The same code path serves both; only the session factory differs (in a
real submit, the session comes from spark-submit's conf, master is the
cluster manager, and --py-files ships this package).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_session(args) -> SparkSession:
    from anomaly_detection_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:  # spark-submit provided one
        return active
    return get_spark("validation-engine", cores=args.cores,
                     shuffle_partitions=args.shuffle_partitions)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="PySpark validation engine")
    p.add_argument("--input", default=None,
                   help="parquet/Iceberg path of (repo,path,commit,lang,content);"
                        " omit to use the deterministic synthetic corpus")
    p.add_argument("--rows", type=int, default=100_000,
                   help="synthetic corpus rows (when --input omitted)")
    p.add_argument("--audit", default=None, help="audit ledger path (enables resume)")
    p.add_argument("--partition-buckets", type=int, default=64,
                   help="repo-hash buckets = resumable work units")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--partitioned-input", action="store_true",
                   help="input uses the catalog bucket layout: resume "
                        "prunes the SCAN to pending buckets "
                        "(PartitionFilters), not just the work")
    p.add_argument("--json", action="store_true", help="emit one JSON line")
    args = p.parse_args(argv)

    spark = build_session(args)
    t0 = time.time()

    from anomaly_detection_spark.catalog import BUCKET_COL

    if args.input:
        corpus = spark.read.parquet(args.input)
    else:
        from anomaly_detection_spark.corpus import generate_code_corpus
        corpus = generate_code_corpus(spark, args.rows)

    from anomaly_detection_spark.operators.constraints import corpus_constraint_codes

    if args.partitioned_input:
        if BUCKET_COL not in corpus.columns:
            raise SystemExit(
                f"--partitioned-input requires a '{BUCKET_COL}' partition "
                "column (write with catalog.write_partitioned)")
        bucket = F.col(BUCKET_COL)
    else:
        bucket = F.pmod(F.xxhash64("repo"), F.lit(args.partition_buckets))

    code_cols = ["c_path_not_null", "c_commit_format", "c_lang_domain",
                 "c_content_len_border"]

    if args.audit:
        from anomaly_detection_spark.audit import AuditLedger, run_partitioned_checks

        ledger = AuditLedger(spark, args.audit)
        if args.partitioned_input:
            # static partition pruning for resume: committed buckets'
            # FILES are never opened (PartitionFilters on the scan)
            done = [int(r["partition_key"])
                    for r in ledger.committed().select("partition_key")
                    .distinct().collect()]
            if done:
                corpus = corpus.filter(~bucket.isin(done))
            checked = corpus_constraint_codes(corpus, keep=[BUCKET_COL])
        else:
            checked = corpus_constraint_codes(corpus).withColumn(
                BUCKET_COL, bucket)
        audit = run_partitioned_checks(
            spark, checked.withColumn("content_len",
                                      F.col("content_len").cast("double")),
            partition_col=BUCKET_COL, value_col="content_len",
            code_cols=code_cols, ledger=ledger,
        )
        n_done = audit.count()
        totals = audit.agg(
            F.sum("n_rows").alias("rows"), F.sum("n_error").alias("errors")
        ).first()
        rows = totals["rows"] or 0
        errors = totals["errors"] or 0
    else:
        checked = corpus_constraint_codes(corpus)
        agg = checked.agg(
            F.count(F.lit(1)).alias("rows"),
            sum(F.sum(F.when(F.col(c) == -1, 1).otherwise(0)) for c in code_cols)
            .alias("errors"),
        ).first()
        rows, errors, n_done = agg["rows"], agg["errors"], args.partition_buckets

    wall = time.time() - t0
    result = {
        "rows": int(rows), "errors": int(errors),
        "partitions_done": int(n_done), "wall_s": round(wall, 2),
        "rows_per_s": round(rows / wall, 1) if wall > 0 else None,
    }
    print(json.dumps(result) if args.json else result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
