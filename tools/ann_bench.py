"""ANN operating-point bench: recall@k vs wall for exact / LSH / IVF.

Deterministic synthetic corpus (no external data): N vectors of dim D
drawn from a seeded clustered mixture (ANN recall on pure-uniform noise
is meaningless — real embedding spaces are clustered), queries are
perturbed corpus members. Ground truth is the exact GEMM path
(cosine_topk_pandas). Prints one JSON line; evidence is recorded in
BENCH/BASELINE.md.

    python tools/ann_bench.py [--n 200000] [--dim 64] [--queries 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n: int, dim: int, n_clusters: int = 256,
                 seed: int = 7):
    """Clustered mixture, generated distributed + deterministic: the
    row id picks its cluster and its noise stream, so any partitioning
    yields the same vectors."""
    from pyspark.sql import functions as F

    centers = np.random.default_rng(seed).normal(size=(n_clusters, dim))

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, i in enumerate(ids):
                r = np.random.default_rng((seed << 32) | int(i))
                out[j] = centers[int(i) % n_clusters] + 0.15 * r.normal(size=dim)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(out)})

    return (
        spark.range(n).repartition(32)
        .mapInPandas(gen, schema="vec_id bigint, embedding array<double>")
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--queries", type=int, default=64)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args()

    from anomaly_detection_spark.functions.similarity import (
        cosine_topk_pandas, ivf_topk, lsh_topk,
    )
    from anomaly_detection_spark.session import get_spark

    spark = get_spark("ann-bench", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    corpus = build_corpus(spark, args.n, args.dim)
    path = "/tmp/ann_bench_corpus"
    corpus.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)

    # queries: perturbed corpus members (ids spread over the id range)
    rng = np.random.default_rng(11)
    qids = sorted(rng.choice(args.n, size=args.queries, replace=False))
    qrows = {r["vec_id"]: np.asarray(r["embedding"])
             for r in corpus.filter(corpus.vec_id.isin([int(q) for q in qids]))
             .collect()}
    qvecs = {int(q): qrows[q] + 0.02 * rng.normal(size=args.dim)
             for q in qids}
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in qvecs.items()],
        "query_id bigint, embedding array<double>")

    def timed(fn, reps=2):
        best, res = None, None
        for _ in range(reps):
            t0 = time.time()
            rows = fn().collect()
            w = time.time() - t0
            if best is None or w < best:
                best, res = w, rows
        return best, res

    def topk_sets(rows):
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    results = {}
    exact_wall, exact_rows = timed(
        lambda: cosine_topk_pandas(corpus, qvecs, k=args.k))
    truth = topk_sets(exact_rows)
    results["exact_gemm"] = {"wall_s": round(exact_wall, 2), "recall": 1.0}

    def recall(rows):
        s = topk_sets(rows)
        return round(sum(len(s.get(q, set()) & truth[q]) / len(truth[q])
                         for q in truth) / len(truth), 3)

    for name, fn in [
        ("lsh_8x4", lambda: lsh_topk(corpus, qdf, k=args.k,
                                     n_planes=8, n_tables=4, dim=args.dim)),
        ("lsh_6x8", lambda: lsh_topk(corpus, qdf, k=args.k,
                                     n_planes=6, n_tables=8, dim=args.dim)),
        ("ivf_256x16", lambda: ivf_topk(corpus, qdf, k=args.k,
                                        n_cells=256, n_probe=16)),
        ("ivf_256x32", lambda: ivf_topk(corpus, qdf, k=args.k,
                                        n_cells=256, n_probe=32)),
    ]:
        w, rows = timed(fn)
        results[name] = {"wall_s": round(w, 2), "recall": recall(rows)}

    print(json.dumps({
        "bench": "ann_recall_vs_wall", "n": args.n, "dim": args.dim,
        "queries": args.queries, "k": args.k, "cores": args.cores,
        "points": results,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
