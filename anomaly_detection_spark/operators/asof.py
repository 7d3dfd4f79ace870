"""As-of join + tolerance-band check.

The reference's fb_Prophet detector (/root/reference/src/algorithms/
fb_prophet.py:130-145) checks each observation against the forecast
uncertainty interval of the NEAREST-timestamp forecast row — i.e. an
as-of join of observations to a (ts, yhat_lower, yhat_upper) table,
then a band check. Spark has no ASOF JOIN operator; this implements the
standard distributed construction:

    union(tagged obs, tagged bounds) ->
    window last_value(bound cols, ignoreNulls) over
        (partition keys ORDER BY ts, is_obs) ->
    filter back to obs rows

One shuffle on (keys), no join explosion, no per-row Python. Backward
as-of semantics (latest bound at-or-before the observation); exact parity
with DuckDB's ASOF JOIN (the oracle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_spark.codes import UNDEFINED_CODE


def asof_join_backward(
    left: DataFrame, right: DataFrame, *, on: str,
    keys: Sequence[str] = (), right_cols: Sequence[str] = (),
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``on`` <= left.on (per keys). Right columns arrive as-is; left rows
    with no preceding right row get NULLs."""
    keys = list(keys)
    rcols = list(right_cols)
    lt = left.withColumn("_is_obs", F.lit(1))
    for c in rcols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *keys, on, *rcols
    ).withColumn("_is_obs", F.lit(0))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.select(*lt.columns).unionByName(rt.select(*lt.columns))
    # bounds sort BEFORE observations at equal ts => at-or-before semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_is_obs").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in rcols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_is_obs") == 1).drop("_is_obs")


def asof_band_check(
    obs: DataFrame, bounds: DataFrame, *, on: str, value: str,
    keys: Sequence[str] = (), lower: str = "yhat_lower",
    upper: str = "yhat_upper", out: str = "code",
) -> DataFrame:
    """Prophet-style tolerance-interval verdict: -1 iff the observation
    falls outside the as-of bounds; rows before any bound are Undefined."""
    if keys:
        joined = asof_join_backward(
            obs, bounds, on=on, keys=keys, right_cols=[lower, upper]
        )
    else:
        joined = asof_join_broadcast(
            obs, bounds, on=on, right_cols=[lower, upper]
        )
    code = (
        F.when(F.col(lower).isNull() | F.col(upper).isNull(),
               F.lit(UNDEFINED_CODE))
        .when((F.col(value) < F.col(lower)) | (F.col(value) > F.col(upper)),
              F.lit(-1))
        .otherwise(F.lit(1))
    )
    return joined.withColumn(out, code)


def asof_join_broadcast(
    left: DataFrame, right: DataFrame, *, on: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Keyless as-of against a SMALL right side (forecast grids, config
    epochs): broadcast the sorted bound arrays and resolve each left row
    with a vectorized ``np.searchsorted`` inside mapInPandas — zero
    shuffle, scales with the left scan only.

    The windowed :func:`asof_join_backward` degrades to a single task
    when ``keys`` is empty (Window.partitionBy() has one partition);
    use THIS variant for the keyless case.
    """
    import numpy as np
    import pandas as pd

    rows = right.select(on, *right_cols).orderBy(on).collect()
    spark = left.sparkSession
    # numeric epoch for searchsorted; timestamps -> ns ints via pandas
    ons = pd.Series([r[on] for r in rows])
    on_vals = ons.astype("int64").to_numpy() if ons.dtype.kind == "M" \
        else ons.to_numpy()
    col_vals = {c: np.array([r[c] for r in rows], dtype=object)
                for c in right_cols}
    bc = spark.sparkContext.broadcast((on_vals, col_vals))

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields
    ) + ", " + ", ".join(
        f"`{c}` {right.schema[c].dataType.simpleString()}" for c in right_cols
    )

    def resolve(batches):
        on_arr, cols = bc.value
        for pdf in batches:
            lv = pdf[on]
            lv = lv.astype("int64").to_numpy() if lv.dtype.kind == "M" \
                else lv.to_numpy()
            idx = np.searchsorted(on_arr, lv, side="right") - 1
            out = pdf.copy()
            for c, vals in cols.items():
                picked = np.empty(len(idx), dtype=object)
                valid = idx >= 0
                picked[valid] = vals[idx[valid]]
                picked[~valid] = None
                out[c] = picked
            yield out

    return left.mapInPandas(resolve, schema=out_fields)
