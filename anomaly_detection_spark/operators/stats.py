"""Per-partition / per-group column statistics — the engine's core profiling
primitive (north rule: "per-partition column stats via Welford streaming
moments and HyperLogLog approx-distinct inside mapInPandas/applyInPandas
Arrow UDFs").

Two paths, same answers:

* :func:`column_profile` — pure Catalyst hash-aggregate (count / nulls /
  mean / stddev / min / max / approx_count_distinct(HLL++)). Map-side
  partial aggregation, whole-stage codegen, linear scaling. This is the
  production path at 100 TB.
* :func:`welford_profile` — explicit mergeable-sketch path: mapInPandas
  computes per-Arrow-batch (count, mean, M2) partials (the distributed
  generalization of the reference's streaming Welford,
  /root/reference/src/algorithms/welford.py:176-191), a tiny groupBy merge
  combines them with Chan's update. Exercises exactly the machinery the
  audit table stores per partition; tested equal to the builtin path.

Both group on explicit keys; hot-key skew is handled by two-level salted
aggregation (:func:`column_profile_salted`) — partial agg on (key, salt)
then final agg on key, which is algebraic for every stat used here.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.sketches import welford_merge


def column_profile(
    df: DataFrame, value: str, keys: Sequence[str] = (), *,
    rsd: float = 0.05,
) -> DataFrame:
    """One stats row per group: n, n_null, n_distinct_approx (HLL++),
    mean, stddev_samp, var_pop, min, max."""
    keys = list(keys)
    v = F.col(value)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
        F.approx_count_distinct(value, rsd).alias("n_distinct_approx"),
        F.avg(v).alias("mean"),
        F.stddev_samp(v).alias("stddev_samp"),
        F.var_pop(v).alias("var_pop"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def column_profile_salted(
    df: DataFrame, value: str, keys: Sequence[str], *, salt_buckets: int = 32
) -> DataFrame:
    """Skew-proof two-level aggregation: every stat here is algebraic
    (count/sum/sumsq/min/max), so partials on (key, salt) merge exactly.
    Use when a single group key (hot repo / hot lang) would overwhelm one
    reducer; the first level fans a hot key over ``salt_buckets`` tasks."""
    keys = list(keys)
    v = F.col(value).cast("double")
    # spray rows of a hot key uniformly over salt buckets; the stats are
    # algebraic so bucket partials merge exactly in the final level
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("_n_null"),
        F.sum(F.coalesce(v, F.lit(0.0))).alias("_s1"),
        F.sum(F.coalesce(v * v, F.lit(0.0))).alias("_s2"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
    )
    nv = F.col("n") - F.col("n_null")
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_n").alias("n"),
            F.sum("_n_null").alias("n_null"),
            F.sum("_s1").alias("s1"),
            F.sum("_s2").alias("s2"),
            F.min("_min").alias("min"),
            F.max("_max").alias("max"),
        )
        .select(
            *keys,
            "n", "n_null",
            (F.col("s1") / nv).alias("mean"),
            F.sqrt(
                F.greatest(
                    (F.col("s2") - F.col("s1") * F.col("s1") / nv) / (nv - 1),
                    F.lit(0.0),
                )
            ).alias("stddev_samp"),
            "min", "max",
        )
    )


# ---------------------------------------------------------------------------
# Explicit mergeable-sketch path (mapInPandas partials + merge)
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = "part_key string, n double, n_null double, mean double, m2 double, vmin double, vmax double"


def welford_partials(df: DataFrame, value: str, key: str | None = None) -> DataFrame:
    """mapInPandas: one partial (count, mean, M2, min, max) row per
    (Arrow batch x group-key) — O(batches) output rows regardless of input
    size. ``key=None`` profiles the whole column (part_key = '')."""

    def update(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            groups = (
                pdf.groupby(key, dropna=False, observed=True)
                if key is not None else [("", pdf)]
            )
            rows = []
            for gkey, g in groups:
                v = g[value].to_numpy(dtype=np.float64, na_value=np.nan)
                nn = np.isnan(v)
                clean = v[~nn]
                n = float(clean.size)
                mean = float(clean.mean()) if n else 0.0
                m2 = float(((clean - mean) ** 2).sum()) if n else 0.0
                rows.append((
                    str(gkey), n, float(nn.sum()), mean, m2,
                    float(clean.min()) if n else np.nan,
                    float(clean.max()) if n else np.nan,
                ))
            yield pd.DataFrame(
                rows, columns=["part_key", "n", "n_null", "mean", "m2", "vmin", "vmax"]
            )

    cols = [value] if key is None else [key, value]
    return df.select(*cols).mapInPandas(update, schema=_PARTIAL_SCHEMA)


def welford_profile(df: DataFrame, value: str, key: str | None = None) -> DataFrame:
    """Partials -> groupBy(part_key).applyInPandas(Chan merge) -> final
    stats. The merge side sees O(partitions) rows per key — trivially small
    at any input scale."""
    partials = welford_partials(df, value, key)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        state = (0.0, 0.0, 0.0)
        n_null = 0.0
        vmin, vmax = np.inf, -np.inf
        for r in pdf.itertuples(index=False):
            state = welford_merge(state, (r.n, r.mean, r.m2))
            n_null += r.n_null
            if r.n > 0:
                vmin = min(vmin, r.vmin)
                vmax = max(vmax, r.vmax)
        n, mean, m2 = state
        return pd.DataFrame([{
            "part_key": pdf["part_key"].iloc[0],
            "n": n, "n_null": n_null, "mean": mean if n else np.nan,
            "var_pop": m2 / n if n else np.nan,
            "stddev_samp": np.sqrt(m2 / (n - 1)) if n > 1 else np.nan,
            "min": vmin if n else np.nan, "max": vmax if n else np.nan,
        }])

    out_schema = ("part_key string, n double, n_null double, mean double, "
                  "var_pop double, stddev_samp double, min double, max double")
    # no fan-out pin (CLAUDE.md exemption): moment-partial MERGE stage
    return partials.groupBy("part_key").applyInPandas(merge, schema=out_schema)


def hll_distinct(df: DataFrame, col: str, key: str | None = None, *,
                 p: int = 12):
    """Approx-distinct via explicit mergeable HLL sketches: one register
    array per (Arrow batch x group) from mapInPandas, byte-serialized,
    max-merged in a final applyInPandas — the same partial/merge shape the
    audit ledger stores. Returns (part_key, n_distinct_approx, sketch).

    Production profiling should prefer the built-in
    ``approx_count_distinct`` (JVM HLL++); this path exists for sketch
    persistence/merging across runs."""
    from anomaly_detection_spark.sketches import HyperLogLog

    def update(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            groups = (pdf.groupby(key, dropna=False, observed=True)
                      if key is not None else [("", pdf)])
            rows = []
            for gkey, g in groups:
                vals = g[col].dropna()
                h = HyperLogLog(p)
                if len(vals):
                    h.add_batch(vals.to_numpy())
                rows.append((str(gkey), h.to_bytes()))
            yield pd.DataFrame(rows, columns=["part_key", "sketch"])

    cols = [col] if key is None else [key, col]
    partials = df.select(*cols).mapInPandas(
        update, schema="part_key string, sketch binary")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from anomaly_detection_spark.sketches import HyperLogLog

        acc = HyperLogLog(p)
        for raw in pdf["sketch"]:
            acc = acc.merge(HyperLogLog.from_bytes(p, raw))
        return pd.DataFrame([{
            "part_key": pdf["part_key"].iloc[0],
            "n_distinct_approx": acc.estimate(),
            "sketch": acc.to_bytes(),
        }])

    # no fan-out pin (CLAUDE.md exemption): HLL-register MERGE stage
    return partials.groupBy("part_key").applyInPandas(
        merge, schema="part_key string, n_distinct_approx double, sketch binary")
