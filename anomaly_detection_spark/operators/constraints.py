"""Row-level constraint checks — the engine's re-imagination of the
reference's ``check_ftr_vector`` record validation
(/root/reference/src/algorithms/anomaly_detection.py:204-263) and
``BorderCheck`` (/root/reference/src/algorithms/border_check.py:122-146)
as pure Catalyst Column expressions.

Every check yields an int status-code column (OK=1 / Warning=0 / Error=-1 /
Undefined=2); a suite is a dict of named code columns combined by the
caller. Zero Python in the hot path — all CASE WHEN chains inside
whole-stage codegen.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.codes import (
    ERROR_CODE,
    OK_CODE,
    UNDEFINED_CODE,
    ladder_code,
    normalized,
)


def not_null(col: Column) -> Column:
    """Missing field -> Undefined, mirroring check_ftr_vector's None/absent
    handling (anomaly_detection.py:206-215)."""
    return F.when(col.isNull(), F.lit(UNDEFINED_CODE)).otherwise(F.lit(OK_CODE))


def not_nan(col: Column) -> Column:
    """NaN in the vector -> Undefined (anomaly_detection.py:233-236)."""
    return (
        F.when(col.isNull() | F.isnan(col), F.lit(UNDEFINED_CODE))
        .otherwise(F.lit(OK_CODE))
    )


def matches_regex(col: Column, pattern: str) -> Column:
    """Format constraint (e.g. 40-char lowercase-hex commit)."""
    return (
        F.when(col.isNull(), F.lit(UNDEFINED_CODE))
        .when(col.rlike(pattern), F.lit(OK_CODE))
        .otherwise(F.lit(ERROR_CODE))
    )


def value_in_set(col: Column, allowed: Sequence[str]) -> Column:
    """Referential/domain constraint (small dim side — the allowed set is a
    literal array, i.e. effectively broadcast)."""
    return (
        F.when(col.isNull(), F.lit(UNDEFINED_CODE))
        .when(col.isin(list(allowed)), F.lit(OK_CODE))
        .otherwise(F.lit(ERROR_CODE))
    )


def arity(col: Column, expected: int) -> Column:
    """Vector-length constraint (anomaly_detection.py:218-222)."""
    return (
        F.when(col.isNull(), F.lit(UNDEFINED_CODE))
        .when(F.size(col) == expected, F.lit(OK_CODE))
        .otherwise(F.lit(UNDEFINED_CODE))
    )


def timestamp_valid(ts: Column, lo: str = "1970-01-01", hi: str = "2100-01-01") -> Column:
    """Timestamp-validity constraint (anomaly_detection.py:247-261)."""
    return (
        F.when(ts.isNull(), F.lit(UNDEFINED_CODE))
        .when((ts >= F.lit(lo).cast("timestamp")) & (ts < F.lit(hi).cast("timestamp")),
              F.lit(OK_CODE))
        .otherwise(F.lit(UNDEFINED_CODE))
    )


def border_check(
    value: Column, LL: float, UL: float, warning_stages: Sequence[float]
) -> Column:
    """The reference's BorderCheck ladder as one Column expression."""
    return ladder_code(normalized(value, LL, UL), warning_stages)


def time_of_day_predicate(
    ts: Column, target: Sequence[int], tolerance: Sequence[int]
) -> Column:
    """Time-of-day stream filter predicate
    (/root/reference/src/consumer.py:195-221 ``filter_by_time``, duplicated
    at anomaly_detection.py:64-81): keep a row iff
    |time_of_day(ts) - target| < tolerance (strict), where both times are
    combined onto the SAME calendar day — 23:59 vs a 00:01 target differs
    by 23h58m, NOT 2min. The no-midnight-wraparound behavior is the
    reference's (datetime.combine on a fixed date), reproduced
    bug-for-bug — including SUB-SECOND precision: the reference compares
    full datetime.time values, so a row at 09:30:00.5 against target
    (12,0,0) tol (2,30,0) is KEPT (2:29:59.5 < 2:30:00); comparing on
    whole seconds would drop it. ``target``/``tolerance`` are (hours,
    minutes, seconds) triples like the reference's config tuples."""
    tod_us = (
        (F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts))
        .cast("bigint") * 1_000_000
        # fractional-second micros (timezone-invariant)
        + F.pmod(F.unix_micros(ts.cast("timestamp")), F.lit(1_000_000))
    )
    tgt = (int(target[0]) * 3600 + int(target[1]) * 60
           + int(target[2])) * 1_000_000
    tol = (int(tolerance[0]) * 3600 + int(tolerance[1]) * 60
           + int(tolerance[2])) * 1_000_000
    return F.abs(tod_us - F.lit(tgt)) < F.lit(tol)


def time_of_day_filter(
    df: DataFrame, ts: str, target: Sequence[int], tolerance: Sequence[int]
) -> DataFrame:
    """Apply :func:`time_of_day_predicate` as a pushdown-friendly filter —
    on an hour-partitioned table the predicate prunes partitions before
    any scan."""
    return df.filter(time_of_day_predicate(F.col(ts), target, tolerance))


def corpus_constraint_codes(df: DataFrame, *,
                            len_LL: float = 10.0,
                            len_UL: float = 50_000.0,
                            warning_stages: Sequence[float] = (0.98,),
                            allowed_langs: Sequence[str] = (
                                "python", "java", "go", "js", "rust", "c", "md",
                            ),
                            keep: Sequence[str] = ()) -> DataFrame:
    """The flagship check suite over the code corpus: one code column per
    constraint plus sha256 row identity for violation parity. ``keep``
    passes extra input columns through (e.g. a partition bucket)."""
    return df.select(
        "row_id", "repo", "path", "commit", "lang", *keep,
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.length("content").alias("content_len"),
        # bytes, not characters: the throughput metric divides by wall
        # time as "GB/s", which must hold for non-ASCII content too
        F.octet_length("content").alias("content_bytes"),
        not_null(F.col("path")).alias("c_path_not_null"),
        matches_regex(F.col("commit"), r"^[0-9a-f]{40}$").alias("c_commit_format"),
        value_in_set(F.col("lang"), allowed_langs).alias("c_lang_domain"),
        border_check(F.length("content").cast("double"), len_LL, len_UL,
                     warning_stages).alias("c_content_len_border"),
    )
