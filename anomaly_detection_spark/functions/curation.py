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
    extra_drop_reasons: dict = field(default_factory=dict)


def curate(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    lang_col: str = "lang", config: CurationConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (curated, report). ``curated`` = surviving rows with quality /
    token columns attached; ``report`` = one row per pipeline stage with
    rows_in/rows_out (computed lazily from counters on the curated plan's
    intermediates — each count is a cheap aggregate on an already-pruned
    scan)."""
    cfg = config or CurationConfig()
    stages = []
    cur = df

    def record(name, before, after):
        stages.append((name, before, after))

    n0 = cur.count()

    # 1. row-local gates (fused into one scan by Catalyst)
    q = quality_score(F.col(text_col))
    cur = cur.withColumn("quality", q).withColumn(
        "n_tokens", ws_token_count(F.col(text_col))
    )
    gated = cur.filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("n_tokens") >= cfg.min_tokens)
    )
    if cfg.lang_from_text:
        gated = lang_id_scored(gated, text_col, out="lang_pred").filter(
            F.col("lang_pred").isin(list(cfg.allowed_langs))
        )
    else:
        gated = gated.filter(F.col(lang_col).isin(list(cfg.allowed_langs)))
    n1 = gated.count()
    record("quality_lang_gate", n0, n1)

    # 2. exact dedup (one digest shuffle)
    exact = exact_dedup(gated, id_col, text_col)
    n2 = exact.count()
    record("exact_dedup", n1, n2)

    # 3. near-dedup: drop the higher-id member of each near-dup pair
    if cfg.near_dedup:
        pairs = minhash_lsh_pairs(
            exact, id_col, text_col,
            jaccard_threshold=cfg.jaccard_threshold,
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        final = exact.join(F.broadcast(losers), on=id_col, how="left_anti")
    else:
        final = exact
    n3 = final.count()
    record("near_dedup", n2, n3)

    curated = final.withColumn(
        "bpe_tokens", bpe_ish_token_count(F.col(text_col))
    )

    spark = df.sparkSession
    report = spark.createDataFrame(
        [(s, int(b), int(a), int(b - a)) for s, b, a in stages],
        "stage string, rows_in long, rows_out long, dropped long",
    )
    return curated, report
