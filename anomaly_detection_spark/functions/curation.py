"""End-to-end training-data curation pipeline: the composition a 100 TB
corpus actually runs — quality gate -> language filter -> exact dedup ->
near-dedup -> budget accounting — expressed as one lazy DataFrame chain
so Catalyst fuses the scalar gates into the scan and the only wide ops
are the two dedup shuffles.

Stage order is deliberate: cheap row-local predicates first (pushed to
the scan, shrink everything downstream), exact dedup before near-dedup
(hash shuffle removes identical copies so LSH never pays for them), and
token accounting last over survivors only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
)
from anomaly_detection_spark.functions.text import (
    bpe_ish_token_count,
    lang_id_scored,
    quality_score,
    ws_token_count,
)


@dataclass
class CurationConfig:
    min_quality: float = 0.5
    allowed_langs: tuple = ("en",)
    lang_from_text: bool = False       # predict via lang_id vs trust column
    near_dedup: bool = True
    jaccard_threshold: float = 0.8
    min_tokens: int = 10
    # False (default): drop the higher id of each PAIR (conservative —
    # docs only drop against a direct near-dup). True: connected-component
    # resolution over the pair graph, keep min id per component
    # (aggressive chain collapse, the common corpus-dedup policy).
    transitive_dedup: bool = False
    extra_drop_reasons: dict = field(default_factory=dict)


def curate(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang", config: CurationConfig | None = None,
    with_report: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """-> (curated, report). ``curated`` = surviving rows with quality /
    token columns attached; ``report`` = one row per pipeline stage with
    rows_in/rows_out.

    Accounting is single-pass, not one count() per stage (which would
    re-execute the whole upstream chain per counter): rows_in comes from
    a column-pruned count on the raw scan (parquet metadata), the gate
    and exact-dedup counters come from ONE conditional aggregation over
    the ranked chain, and the near-dedup drop count reuses the
    (persisted, small) loser-id set the anti-join consumes — so the
    expensive gate/dedup chain executes once for the report and the
    LSH chain once. ``with_report=False`` skips every counting job and
    returns an empty report (pure lazy pipeline for production runs)."""
    cfg = config or CurationConfig()

    # 1. row-local gates (fused into the scan by Catalyst — keep them as
    # FILTERS so predicate pushdown shrinks the dedup shuffle)
    cur = df.withColumn("quality", quality_score(F.col(text_col))).withColumn(
        "n_tokens", ws_token_count(F.col(text_col))
    )
    gate = (F.col("quality") >= cfg.min_quality) & (
        F.col("n_tokens") >= cfg.min_tokens
    )
    if cfg.lang_from_text:
        cur = lang_id_scored(cur, text_col, out="lang_pred")
        gate = gate & F.col("lang_pred").isin(list(cfg.allowed_langs))
    else:
        gate = gate & F.col(lang_col).isin(list(cfg.allowed_langs))
    gated = cur.filter(gate)

    # 2. exact dedup (one digest shuffle); the rank column doubles as the
    # keeper marker for single-pass accounting — same definition as the
    # standalone operator (dedup.exact_dedup), not a re-implementation
    ranked = exact_dedup(gated, id_col, text_col, ranked=True)
    exact = ranked.filter(F.col("_rn") == 1).drop("_rn")

    # 3. near-dedup: drop the higher-id member of each near-dup pair.
    # The loser-id set is persisted (tiny: near-dup losers only) because
    # it is consumed by both the drop count and the anti-join; no
    # broadcast hint — at corpus scale the loser set may exceed the
    # driver, so AQE picks the join strategy from its observed size.
    losers = None
    if cfg.near_dedup:
        pairs = minhash_lsh_pairs(
            exact, id_col, text_col,
            jaccard_threshold=cfg.jaccard_threshold,
        )
        if cfg.transitive_dedup:
            from anomaly_detection_spark.functions.dedup import (
                resolve_components,
            )
            comp = resolve_components(pairs)
            losers = comp.filter(F.col("id") != F.col("component")) \
                .select(F.col("id").alias(id_col))
        else:
            losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        from pyspark.storagelevel import StorageLevel
        losers = losers.persist(StorageLevel.MEMORY_AND_DISK)
        final = exact.join(losers, on=id_col, how="left_anti")
    else:
        final = exact

    curated = final.withColumn(
        "bpe_tokens", bpe_ish_token_count(F.col(text_col))
    )

    spark = df.sparkSession
    if not with_report:
        return curated, spark.createDataFrame(
            [], "stage string, rows_in long, rows_out long, dropped long")

    n0 = df.count()  # column-pruned scan: parquet footer counts
    c = ranked.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum((F.col("_rn") == 1).cast("long")).alias("n2"),
    ).first()
    n1, n2 = int(c["n1"]), int(c["n2"])
    n3 = n2 - (losers.count() if losers is not None else 0)
    stages = [("quality_lang_gate", n0, n1), ("exact_dedup", n1, n2),
              ("near_dedup", n2, n3)]
    report = spark.createDataFrame(
        [(s, int(b), int(a), int(b - a)) for s, b, a in stages],
        "stage string, rows_in long, rows_out long, dropped long",
    )
    return curated, report
