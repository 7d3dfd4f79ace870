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
  collisions in any table, exact per-bucket GEMM re-rank (query-occupied
  buckets only; candidate pairs never materialize). Recall is tunable
  with n_tables/n_planes.

* :func:`ivf_topk` — IVF (inverted-file) ANN: a spherical k-means
  coarse quantizer (seeded numpy Lloyd on a driver-side sample) maps
  every corpus vector to its nearest-centroid cell (one GEMM per Arrow
  batch, narrow (id, cell) rows); a query probes its ``n_probe``
  closest cells and exact-re-ranks only those cells' members. Versus
  LSH: cells adapt to the data distribution, so recall per candidate
  examined is typically higher.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_spark.sampling import bounded_sample_rows


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


def sign_bucket_rows(
    df: DataFrame, id_name: str, vec_col: str, planes: np.ndarray,
    n_tables: int, n_planes: int,
) -> DataFrame:
    """(id, tbl, bkt) rows: all ``n_tables`` random-hyperplane sign
    buckets per vector computed in ONE numpy GEMM per Arrow batch
    (``sign(X @ P.T)`` over the stacked plane matrix) — a higher-order
    `aggregate(zip_with(...))` formulation is interpreted per element and
    measured ~an order slower on the corpus hot path (PLANS.md lesson #1).
    Output is narrow: the dense vectors never leave the scan stage."""
    shifts = np.arange(n_planes, dtype=np.int64)

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (X @ planes.T >= 0).astype(np.int64)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            bkt = (bits << shifts).sum(axis=2)
            yield pd.DataFrame({
                id_name: np.repeat(pdf[id_name].to_numpy(), n_tables),
                "tbl": np.tile(np.arange(n_tables, dtype=np.int32), len(pdf)),
                "bkt": bkt.reshape(-1),
            })

    # keep the caller's id dtype (string doc ids are legal — a cast to
    # long would throw under ANSI mode and change downstream join types)
    id_type = df.select(id_name).schema[0].dataType.simpleString()
    return df.select(id_name, vec_col).mapInPandas(
        bucketize, schema=f"`{id_name}` {id_type}, tbl int, bkt bigint")


def spherical_kmeans(X: np.ndarray, k: int, *, iters: int = 20,
                     seed: int = 0) -> np.ndarray:
    """Seeded Lloyd iterations on unit-normalized vectors (cosine
    k-means): assignment = argmax dot, update = normalized mean. Pure
    vectorized numpy — one (n, k) GEMM per iteration. Empty clusters are
    re-seeded from the farthest points (deterministic)."""
    rng = np.random.default_rng(seed)
    Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
    k = min(k, len(Xn))
    C = Xn[rng.choice(len(Xn), size=k, replace=False)]
    for _ in range(iters):
        S = Xn @ C.T                       # (n, k)
        assign = S.argmax(axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, Xn)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            worst = np.argsort(S.max(axis=1))[: int(empty.sum())]
            newC[empty] = Xn[worst]
            counts[empty] = 1
        C = newC / np.clip(np.linalg.norm(newC, axis=1, keepdims=True),
                           1e-12, None)
    return C


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", query_id: str = "query_id", k: int = 10,
    n_cells: int = 64, n_probe: int = 8, train_sample: int = 4096,
    kmeans_iters: int = 20, seed: int = 0,
) -> DataFrame:
    """IVF approximate top-k by cosine: (query_id, vec_id, cosine, rank).

    Train — sample up to ``train_sample`` corpus vectors to the driver
    (bounded, independent of corpus size) and fit the spherical-k-means
    coarse quantizer. Index — ONE GEMM per Arrow batch assigns each
    corpus vector to its nearest centroid; rows whose cell no query
    probes are dropped AT THE SCAN, so the only wide op is one shuffle
    of the probed cells' (id, cell, vector) rows. Search — the query
    batch is driver-resident (bounded: the prior shape broadcast it per
    join, the same size contract); per probed cell ONE GEMM scores
    members x probing queries and emits k-row partials; a final window
    merges partials — lossless, since any global top-k member must be
    top-k within some probed cell it shares with the query. Candidate
    (query, id) pairs are NEVER materialized: the previous pair-join +
    dedup + per-pair vector fetch moved 13M rows and ~6 GB of vectors at
    1024 queries x 200k corpus (24s); this shape runs the same search in
    ~3s and scales linearly in corpus size with a single narrow shuffle
    (tools/ann_bench.py). Recall is tuned with n_probe/n_cells."""
    rows = bounded_sample_rows(corpus.select(vec_col), train_sample,
                               seed=seed)
    X = np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])
    C = spherical_kmeans(X, n_cells, iters=kmeans_iters, seed=seed)

    id_type = corpus.select(id_col).schema[0].dataType.simpleString()
    q_type = queries.select(query_id).schema[0].dataType.simpleString()
    vec_type = corpus.select(vec_col).schema[0].dataType.simpleString()
    out_schema = (f"`{query_id}` {q_type}, `{id_col}` {id_type}, "
                  "cosine double")

    q_rows = queries.select(query_id, vec_col).collect()
    spark = corpus.sparkSession
    if not q_rows:
        return spark.createDataFrame([], out_schema + ", rank int")
    qids = [r[0] for r in q_rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Qn = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12, None)
    p = min(n_probe, C.shape[0])
    probe = np.argpartition(-(Qn @ C.T), p - 1, axis=1)[:, :p]
    cell_queries: dict[int, list[int]] = {}
    for j in range(len(qids)):
        for c in probe[j]:
            cell_queries.setdefault(int(c), []).append(j)
    probed = np.array(sorted(cell_queries), dtype=np.int32)

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True),
                            1e-12, None)
            cells = (M @ C.T).argmax(axis=1).astype(np.int32)
            keep = np.isin(cells, probed)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[keep],
                "cell": cells[keep],
                vec_col: pdf[vec_col].to_numpy()[keep],
            })

    indexed = corpus.select(id_col, vec_col).mapInPandas(
        assign_cells,
        schema=f"`{id_col}` {id_type}, cell int, `{vec_col}` {vec_type}")

    def cell_topk(key, pdf):
        js = cell_queries.get(int(key[0]))
        if not js or not len(pdf):
            return pd.DataFrame({query_id: [], id_col: [], "cosine": []})
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True),
                         1e-12, None)
        S = Mn @ Qn[js].T  # (members, probing queries)
        ids = pdf[id_col].to_numpy()
        top = min(k, len(ids))
        part = np.argpartition(-S, top - 1, axis=0)[:top]
        out_q, out_i, out_c = [], [], []
        for jj, j in enumerate(js):
            sel = part[:, jj]
            out_q.extend([qids[j]] * len(sel))
            out_i.extend(ids[sel])
            out_c.extend(S[sel, jj])
        return pd.DataFrame({query_id: out_q, id_col: out_i,
                             "cosine": out_c})

    # explicit fan-out pin: the per-cell groups are Python/GEMM work and
    # the shuffle is small, so AQE would coalesce them (PLANS.md lesson 8)
    n_parts = min(max(len(probed), 1),
                  int(spark.conf.get("spark.sql.shuffle.partitions")))
    partials = (
        indexed.repartition(n_parts, "cell")
        .groupBy("cell")
        .applyInPandas(cell_topk, schema=out_schema)
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, *, id_col: str = "vec_id",
    vec_col: str = "embedding", query_id: str = "query_id", k: int = 10,
    n_planes: int = 8, n_tables: int = 4, seed: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: per table, bucket = sign pattern over n_planes
    seeded hyperplanes; candidates = same (table, bucket) as the query in
    ANY table. Shape mirrors :func:`ivf_topk`: query buckets are computed
    driver-side (the query batch is broadcast-small by contract), corpus
    buckets in ONE GEMM per Arrow batch (same math as
    :func:`sign_bucket_rows`); rows whose (table, bucket) no query
    occupies are dropped at the scan, so the only wide op shuffles the
    matching buckets' (id, tbl, bkt, vector) rows. Per bucket one GEMM
    scores members x that bucket's queries and emits k-row partials;
    cross-table duplicates collapse in a dropDuplicates over the TINY
    partial set, then a window merges — lossless for global top-k.
    Candidate (query, id) pairs never materialize (the previous
    pair-join + per-pair vector fetch took 11-50s at 1024 queries x 200k
    corpus; this shape ~3-4s, tools/ann_bench.py)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables * n_planes, dim))
    shifts = np.arange(n_planes, dtype=np.int64)

    id_type = corpus.select(id_col).schema[0].dataType.simpleString()
    q_type = queries.select(query_id).schema[0].dataType.simpleString()
    vec_type = corpus.select(vec_col).schema[0].dataType.simpleString()
    out_schema = (f"`{query_id}` {q_type}, `{id_col}` {id_type}, "
                  "cosine double")

    q_rows = queries.select(query_id, vec_col).collect()
    spark = corpus.sparkSession
    if not q_rows:
        return spark.createDataFrame([], out_schema + ", rank int")
    qids = [r[0] for r in q_rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    Qn = Q / np.clip(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12, None)
    qbits = (Q @ planes.T >= 0).astype(np.int64).reshape(
        len(qids), n_tables, n_planes)
    qbkt = (qbits << shifts).sum(axis=2)  # (q, tbl)
    bucket_queries: dict[tuple[int, int], list[int]] = {}
    for j in range(len(qids)):
        for t in range(n_tables):
            bucket_queries.setdefault((t, int(qbkt[j, t])), []).append(j)
    tbl_buckets = [
        np.array(sorted({b for (t, b) in bucket_queries if t == ti}),
                 dtype=np.int64)
        for ti in range(n_tables)
    ]

    def bucketize_keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (X @ planes.T >= 0).astype(np.int64)
            bkt = (bits.reshape(len(pdf), n_tables, n_planes)
                   << shifts).sum(axis=2)  # (rows, tbl)
            ids = pdf[id_col].to_numpy()
            vecs = pdf[vec_col].to_numpy()
            out_i, out_t, out_b, out_v = [], [], [], []
            for t in range(n_tables):
                col = bkt[:, t]
                keep = np.isin(col, tbl_buckets[t])
                if not keep.any():
                    continue
                out_i.extend(ids[keep])
                out_t.extend([t] * int(keep.sum()))
                out_b.extend(col[keep])
                out_v.extend(vecs[keep])
            yield pd.DataFrame({id_col: out_i, "tbl": out_t, "bkt": out_b,
                                vec_col: out_v})

    members = corpus.select(id_col, vec_col).mapInPandas(
        bucketize_keep,
        schema=(f"`{id_col}` {id_type}, tbl int, bkt bigint, "
                f"`{vec_col}` {vec_type}"))

    def bucket_topk(key, pdf):
        js = bucket_queries.get((int(key[0]), int(key[1])))
        if not js or not len(pdf):
            return pd.DataFrame({query_id: [], id_col: [], "cosine": []})
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True),
                         1e-12, None)
        S = Mn @ Qn[js].T
        ids = pdf[id_col].to_numpy()
        top = min(k, len(ids))
        part = np.argpartition(-S, top - 1, axis=0)[:top]
        out_q, out_i, out_c = [], [], []
        for jj, j in enumerate(js):
            sel = part[:, jj]
            out_q.extend([qids[j]] * len(sel))
            out_i.extend(ids[sel])
            out_c.extend(S[sel, jj])
        return pd.DataFrame({query_id: out_q, id_col: out_i,
                             "cosine": out_c})

    # explicit fan-out pin against AQE coalescing (PLANS.md lesson 8)
    n_parts = min(max(len(bucket_queries), 1),
                  int(spark.conf.get("spark.sql.shuffle.partitions")))
    partials = (
        members.repartition(n_parts, "tbl", "bkt")
        .groupBy("tbl", "bkt")
        .applyInPandas(bucket_topk, schema=out_schema)
        # a pair matching in several tables yields identical-cosine rows;
        # collapse them on the tiny partial set before ranking
        .dropDuplicates([query_id, id_col])
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, id_col, "cosine", "rank")
    )
