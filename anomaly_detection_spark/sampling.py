"""Driver-side bounded training samples WITHOUT a count-before-sample
scan.

The round-2 shape (``n = df.count()`` then ``sample(target/n)``) paid a
full column-pruned scan per model fit just to compute the sampling
fraction. ``sample(fraction).limit(n)`` needs no count: the limit
executes incrementally (Spark reads only as many partitions as it takes
to fill ``n`` rows), so the big-data path is one PARTIAL scan. If the
sampled stream under-fills — a small table, where fraction * n < target
— fall back to ``limit(n)`` on the raw frame, a trivial scan at that
scale that also preserves the round-2 behavior exactly (all rows, source
order) for tables smaller than the target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bounded_sample_rows(
    df: DataFrame, n: int, *, fraction: float = 0.1, seed: int = 0,
) -> list:
    """Up to ``n`` driver-side Rows from ``df``: one incremental partial
    scan at scale, deterministic (fixed seed + deterministic input
    partitioning), never a count job."""
    rows = df.sample(fraction=fraction, seed=seed).limit(n).collect()
    if len(rows) < n:
        rows = df.limit(n).collect()
    return rows
