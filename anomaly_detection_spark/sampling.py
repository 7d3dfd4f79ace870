"""Driver-side bounded training samples WITHOUT a count-before-sample
scan.

The round-2 shape (``n = df.count()`` then ``sample(target/n)``) paid a
full column-pruned scan per model fit just to compute the sampling
fraction. A global ``sample(f).limit(n)`` avoids the count but is a
PREFIX of the table's first partitions — a time-ordered table would
train its models on the oldest slice only. Instead, every partition
contributes up to ``ceil(n / num_partitions)`` rows: partition count is
plan metadata (no job), the per-partition ``islice`` stops consuming its
(lazy) iterator after k rows so each task is a bounded partial read, and
coverage spans the WHOLE table at partition granularity. Rows are
seeded-sampled within each partition's scanned prefix; if the sampled
pass under-fills (small table or low fraction), a second pass takes the
plain per-partition prefixes — still spread across all partitions, never
a global head.
"""

from __future__ import annotations

from itertools import islice

from pyspark.sql import DataFrame


def bounded_sample_rows(
    df: DataFrame, n: int, *, fraction: float = 0.1, seed: int = 0,
) -> list:
    """Up to ``n`` driver-side Rows from ``df``, spread over ALL
    partitions: deterministic (fixed seed, deterministic partitioning),
    bounded partial read per partition, never a count job. Guaranteed to
    return min(n, len(df)) rows: skew-proof because the final fallback
    lets EVERY partition contribute up to n rows (sum of per-partition
    minima >= min(total, n)), so one hot partition after a selective
    filter can fill the sample alone."""
    p = max(1, df.rdd.getNumPartitions())
    k = -(-n // p)  # ceil
    rows = (
        df.sample(fraction=fraction, seed=seed)
        .rdd.mapPartitions(lambda it: islice(it, k))
        .collect()
    )
    if len(rows) < n:
        # balanced per-partition prefixes
        rows = df.rdd.mapPartitions(lambda it: islice(it, k)).collect()
    if len(rows) < n:
        # skewed/mostly-empty partitions: allow any partition to fill
        # the whole sample (still a bounded early-stopping read)
        rows = df.rdd.mapPartitions(lambda it: islice(it, n)).collect()
    return rows[:n]
