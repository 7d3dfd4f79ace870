"""Benchmark decontamination: flag training documents that share a word
n-gram with an evaluation benchmark.

The public recipe (GPT-2/GPT-3 appendix C, Gopher §A.5, LLaMA): a
training document is *contaminated* if any normalized word n-gram
(n ~ 8-13) also occurs in an eval benchmark; contaminated docs are
dropped or split. Scale shape matters more than the formula:

* the benchmark side is SMALL (thousands of prompts) — its distinct
  n-gram set is built once and **broadcast**; the 100-TB corpus is never
  shuffled to meet it;
* the corpus side explodes its distinct n-grams **per partition** and
  meets the broadcast set in the scan stage; only MATCHED (doc, gram)
  pairs — a vanishing fraction — reach the per-doc count aggregate, so
  the one shuffle in the plan carries matches, not the corpus;
* at scale the join key is a 64-bit gram hash (xxhash64, codegen'd,
  8 bytes instead of ~80-byte strings); hash collisions can only
  ADD false contamination hits (conservative direction for
  decontamination — never misses a real overlap).

Both the exact (string-key) and hash forms are provided; the driver
query runs both and asserts they agree, the hll_accuracy pattern for
oracle-checking an approximation (the oracle replays the exact form in
ANSI SQL — DuckDB has no xxhash64).

Normalization: lowercase + split on whitespace runs (the same portable
split every text.py token expression uses) — identical in Spark and
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text: Column, n: int, *, lower: bool = True,
                distinct: bool = True) -> Column:
    """Word n-grams of ``text`` as array<string> (space-joined,
    lowercased; distinct by default — contamination is set membership).
    Docs with fewer than ``n`` words yield an empty array (a short doc
    cannot be contaminated at this n). Pure codegen HOFs — no Python,
    no shuffle."""
    t = F.lower(text) if lower else text
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != "")
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    if distinct:
        grams = F.array_distinct(grams)
    return F.when(k >= 1, grams).otherwise(
        F.array().cast("array<string>"))


def word_ngrams_sql(col: str, n: int, *, lower: bool = True,
                    distinct: bool = True) -> str:
    """DuckDB twin of :func:`word_ngrams` (list slicing is inclusive of
    the end index, hence ``i : i + n - 1``)."""
    t = f"lower({col})" if lower else col
    words = f"list_filter(string_split_regex(trim({t}), '\\s+'), w -> w <> '')"
    grams = (f"list_transform(range(1, len({words}) - {n - 1} + 1), "
             f"i -> array_to_string(({words})[i : i + {n - 1}], ' '))")
    if distinct:
        grams = f"list_distinct({grams})"
    return f"""
CASE WHEN len({words}) >= {n} THEN {grams} ELSE [] END
"""


def benchmark_grams(bench: DataFrame, *, text_col: str = "text",
                    n: int = 8) -> DataFrame:
    """Distinct normalized n-grams of the benchmark — the broadcast side.
    One column ``gram``; callers add the hash if they join hashed."""
    return (bench
            .select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
            .distinct())


def contamination_report(docs: DataFrame, bench: DataFrame, *,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 8, hashed: bool = True) -> DataFrame:
    """Per-document contamination counts vs a benchmark.

    Returns (id_col, n_shared_grams, contaminated) covering EVERY input
    doc (uncontaminated docs report 0/false — decontamination is a
    keep/drop decision for each doc, so the report must be total).

    ``hashed=True`` joins on xxhash64(gram) — the 100-TB path (narrow
    8-byte broadcast keys). ``hashed=False`` joins on the gram string —
    the exact form the DuckDB oracle can replay.
    """
    grams = docs.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    bset = benchmark_grams(bench, text_col=text_col, n=n)
    if hashed:
        grams = grams.withColumn("_k", F.xxhash64("gram"))
        bset = bset.select(F.xxhash64("gram").alias("_k")).distinct()
        joined = grams.join(F.broadcast(bset), "_k", "left_semi")
    else:
        joined = grams.join(F.broadcast(bset), "gram", "left_semi")
    hits = (joined.groupBy(id_col)
            .agg(F.countDistinct("gram").alias("n_shared_grams")))
    all_ids = docs.select(id_col).distinct()
    return (all_ids.join(hits, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
                (F.coalesce("n_shared_grams", F.lit(0)) > 0
                 ).alias("contaminated")))


def contamination_report_sql(*, docs_sql: str, bench_sql: str,
                             id_col: str = "doc_id", text_col: str = "text",
                             n: int = 8) -> str:
    """DuckDB twin of the exact (string-key) contamination report."""
    return f"""
WITH d AS ({docs_sql}), b AS ({bench_sql}),
bset AS (
  SELECT DISTINCT unnest({word_ngrams_sql(text_col, n)}) AS gram FROM b
),
dgrams AS (
  SELECT {id_col}, unnest({word_ngrams_sql(text_col, n)}) AS gram FROM d
),
hits AS (
  SELECT {id_col}, count(DISTINCT gram) AS n_shared_grams
  FROM dgrams WHERE gram IN (SELECT gram FROM bset)
  GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(hits.n_shared_grams, 0) AS n_shared_grams,
       COALESCE(hits.n_shared_grams, 0) > 0 AS contaminated
FROM (SELECT DISTINCT {id_col} FROM d) d
LEFT JOIN hits ON d.{id_col} = hits.{id_col}
"""
