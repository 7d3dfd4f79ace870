"""Headless re-imagining of the reference's visualization.py.

The reference draws live matplotlib figures (GraphVisualization
/root/reference/src/visualization.py:18, StatusPointsVisualization :81,
HistogramVisualization :232). A headless distributed engine ships the
*data those figures draw* instead — render-ready DataFrames carrying
exactly the reference's buffer semantics — so any front end (notebook,
BI tool, the reference's own matplotlib code) can reproduce the figure:

- :func:`graph_tail` — GraphVisualization's sliding buffer: the last
  ``num_of_points`` values per series with the reference's global
  update counter as x (``self.count``, visualization.py:58,79).
- :func:`status_points` — StatusPointsVisualization's scatter: the same
  tail plus per-point color via the reference's status→color map
  (visualization.py:215-230: OK→``w``, Warning→``y``, Error→``r``,
  Undefined→``b``) and the documented companion lines
  ``[lastvalue, moving_average, avg+sigma, avg-sigma]``
  (visualization.py:110-113) from a trailing window.
- :func:`histogram_bins` — HistogramVisualization's running histogram:
  ``bins = linspace(lo, hi, num_of_bins)`` and
  ``bin_vals[np.digitize(v, bins)] += 1`` (visualization.py:252-258),
  i.e. bin i counts values in ``[bins[i-1], bins[i])`` and bin 0 counts
  values below ``lo``. Values ``>= hi`` would IndexError in the
  reference (digitize returns ``num_of_bins``); here they land in a
  schema-stable overflow row ``x = num_of_bins`` (NULL edge) so the
  violation is visible instead of fatal.

Scale: every function is pure Catalyst — tail-N is one row_number per
series partition (one shuffle, no Python), the companion bands are the
same trailing frame the Welford check uses, and the histogram is a
map-side-combined groupBy on a codegen'd floor expression. Nothing here
collects more than the render payload itself.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anomaly_detection_spark.codes import (
    ERROR_CODE, OK_CODE, UNDEFINED_CODE, WARNING_CODE,
)

# visualization.py:215-230 — get_color(status_code)
STATUS_COLORS = {
    OK_CODE: "w",
    WARNING_CODE: "y",
    ERROR_CODE: "r",
    UNDEFINED_CODE: "b",
}


def status_color(code: Column) -> Column:
    """The reference's status→color map (visualization.py:215-230).

    An invalid code makes the reference ``exit(1)``; a distributed
    report can't abort per-row, so invalid codes yield NULL — callers
    can assert ``color IS NOT NULL`` to reproduce the hard failure.
    """
    expr = F.lit(None).cast("string")
    for c, col in STATUS_COLORS.items():
        expr = F.when(code == c, F.lit(col)).otherwise(expr)
    return expr


def graph_tail(
    df: DataFrame, keys, order: str, values: Sequence[str], *,
    num_of_points: int = 50, x_col: str = "x",
) -> DataFrame:
    """GraphVisualization's buffer: last ``num_of_points`` rows per
    series, x = the 0-based per-series update count (the reference's
    ``self.count``, visualization.py:58,79).

    One window shuffle on the series key; the ascending and descending
    row_numbers share the partitioning so Catalyst plans a single
    exchange. ``values`` mirrors num_of_lines>1: pass one column per
    plotted line.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w_asc = Window.partitionBy(*keys).orderBy(order)
    w_desc = Window.partitionBy(*keys).orderBy(F.col(order).desc())
    return (
        df.withColumn(x_col, F.row_number().over(w_asc) - 1)
        .withColumn("_gt_rev", F.row_number().over(w_desc))
        .filter(F.col("_gt_rev") <= num_of_points)
        .drop("_gt_rev")
        .select(*keys, x_col, *values)
    )


def status_points(
    df: DataFrame, keys, order: str, value: str, code: str, *,
    num_of_points: int = 50, band_n: int = 10, band_x: float = 1.0,
    x_col: str = "x",
) -> DataFrame:
    """StatusPointsVisualization's render payload: the tail scatter with
    the reference's color per point plus its documented companion lines
    ``[lastvalue, moving_average, avg+sigma, avg-sigma]``
    (visualization.py:110-113) over a trailing ``band_n``-row window.

    ``code`` is any status-code column from the detector family (the
    reference feeds its visualizations from detector output,
    AnomalyDetectorWrapper -> visualization.update(value, status_code)).
    Same single series-key shuffle as :func:`graph_tail`; avg/stddev
    ride the identical window frame so no extra exchange.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w_asc = Window.partitionBy(*keys).orderBy(order)
    frame = w_asc.rowsBetween(-(band_n - 1), 0)
    w_desc = Window.partitionBy(*keys).orderBy(F.col(order).desc())
    avg = F.avg(value).over(frame)
    sd = F.coalesce(F.stddev_samp(value).over(frame), F.lit(0.0))
    return (
        df.withColumn(x_col, F.row_number().over(w_asc) - 1)
        .withColumn("avg", avg)
        .withColumn("hi", avg + band_x * sd)
        .withColumn("lo", avg - band_x * sd)
        .withColumn("color", status_color(F.col(code)))
        .withColumn("_sp_rev", F.row_number().over(w_desc))
        .filter(F.col("_sp_rev") <= num_of_points)
        .drop("_sp_rev")
        .select(*keys, x_col, value, "avg", "hi", "lo", "color")
    )


def histogram_bins(
    df: DataFrame, value: str, *, num_of_bins: int, lo: float, hi: float,
    x_col: str = "x",
) -> DataFrame:
    """HistogramVisualization's running histogram as a DataFrame.

    Reference binning (visualization.py:252-258): edges =
    ``linspace(lo, hi, num_of_bins)``; ``bin_vals[digitize(v)] += 1``
    — bin i counts ``[edge[i-1], edge[i])``, bin 0 counts ``v < lo``.
    Because linspace edges are ``lo + i*step`` with
    ``step = (hi-lo)/(num_of_bins-1)``, digitize equals
    ``floor((v-lo)/step) + 1`` for in-range v — one codegen'd
    expression, identical IEEE arithmetic on engine and oracle sides
    (differentially tested against np.digitize). Values ``>= hi``
    (reference: IndexError) land in overflow row ``x = num_of_bins``
    with a NULL edge. Empty bins are emitted with n=0 (the reference
    buffer holds zeros), via a broadcast join against a
    ``spark.range(num_of_bins+1)`` frame.

    Plan: map-side-combined groupBy on the bin index (one narrow
    shuffle of <= num_of_bins+1 rows), broadcast the tiny bin spine.
    """
    step = (hi - lo) / (num_of_bins - 1)
    v = F.col(value)
    idx = (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(num_of_bins))
        .otherwise(F.floor((v - lo) / F.lit(step)).cast("int") + 1)
    )
    counts = df.select(idx.alias(x_col)).groupBy(x_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        df.sparkSession.range(num_of_bins + 1)
        .select(F.col("id").cast("int").alias(x_col))
    )
    edge = F.when(
        F.col(x_col) < num_of_bins,
        F.lit(lo) + F.col(x_col).cast("double") * F.lit(step),
    )
    return (
        spine.join(counts.hint("broadcast"), x_col, "left")
        .select(
            x_col,
            edge.alias("edge"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
