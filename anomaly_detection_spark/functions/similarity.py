"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set, cross-join against the corpus, dot products via ``zip_with`` +
  ``aggregate`` (JVM higher-order functions, no Python), per-query top-k
  with a window. One scan of the corpus regardless of query count — the
  correctness baseline and the right plan when queries are few.
* :func:`cosine_topk_pandas` — the same math as an Arrow-batched pandas
  UDF doing one numpy matmul per batch: (batch x dim) @ (dim x q). Faster
  constant factor when q is large; identical results.
* :func:`lsh_topk` — approximate scale path: random-hyperplane sign
  buckets over ``n_tables`` independent tables; candidates = bucket
  collisions in any table, exact re-rank inside candidates. Recall is
  tunable with n_tables/n_planes; the corpus-side shuffle is one
  hash-partition per table on the bucket id.

An IVF variant (k-means coarse quantizer) deliberately isn't here: with
no BLAS-backed k-means in the container, random-hyperplane LSH is the
honest scale path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda a, x: a + x))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", query_id: str = "query_id", k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank). The query
    side is broadcast — never put the corpus on the build side."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_cv"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", dot / (F.col("_qn") * F.col("_cn")))
    )
    # Two-level top-k: a global rank window would funnel EVERY corpus row
    # of a query through one task. Partial top-k per scan partition
    # (sorted-array truncation inside a hash aggregate), then the final
    # rank runs over queries x partitions x k rows — tiny at any scale.
    partial = (
        scored.groupBy(query_id, F.spark_partition_id().alias("_pid"))
        .agg(F.slice(
            F.sort_array(
                F.collect_list(F.struct(
                    F.col("cosine").alias("c"), F.col(id_col).alias("i"))),
                asc=False,
            ), 1, k).alias("_top"))
        .select(query_id, F.explode("_top").alias("t"))
        .select(query_id, F.col("t.i").alias(id_col),
                F.col("t.c").alias("cosine"))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def cosine_topk_pandas(
    corpus: DataFrame, query_vecs: dict[int, np.ndarray], *,
    id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10,
) -> DataFrame:
    """Same result as :func:`cosine_topk` via one numpy GEMM per Arrow
    batch, then a global per-query top-k aggregation of the per-batch
    top-k partials (algebraic, so the combine is exact)."""
    qids = sorted(query_vecs)
    Q = np.stack([np.asarray(query_vecs[i], dtype=np.float64) for i in qids])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None)
            S = M @ Qn.T  # (batch, q)
            ids = pdf[id_col].to_numpy()
            top = min(k, len(ids))
            part = np.argpartition(-S, top - 1, axis=0)[:top]
            rows = []
            for j, qid in enumerate(qids):
                sel = part[:, j]
                rows.append(pd.DataFrame({
                    "query_id": qid, id_col: ids[sel], "cosine": S[sel, j],
                }))
            yield pd.concat(rows, ignore_index=True)

    partials = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"query_id bigint, {id_col} bigint, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _bucket_expr(vec_col: str, planes: np.ndarray):
    bucket = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        s = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bit = F.when(s >= 0, F.lit(1)).otherwise(F.lit(0)) * (2 ** i)
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", query_id: str = "query_id", k: int = 10,
    n_planes: int = 8, n_tables: int = 4, seed: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: per table, bucket = sign pattern over n_planes
    seeded hyperplanes; candidates = same (table, bucket) as the query in
    ANY table; exact cosine re-rank on candidates only."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)

    def with_buckets(df, idc):
        out = df.select(F.col(idc), F.col(vec_col))
        tables = []
        for t in range(n_tables):
            planes = rng.normal(size=(n_planes, dim))
            tables.append(F.struct(F.lit(t).alias("tbl"),
                                   _bucket_expr(vec_col, planes).alias("bkt")))
        return out.select(
            idc, vec_col, F.explode(F.array(*tables)).alias("tb")
        ).select(idc, vec_col, "tb.tbl", "tb.bkt")

    rng = np.random.default_rng(seed)
    cb = with_buckets(corpus, id_col)
    rng = np.random.default_rng(seed)  # same planes for the query side
    qb = with_buckets(queries, query_id).withColumnRenamed(vec_col, "_qv")

    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .dropDuplicates([query_id, id_col])
    )
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qv"), lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = cand.withColumn(
        "cosine", dot / (_norm(F.col(vec_col)) * _norm(F.col("_qv")))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )
