"""Within-document repetition / boilerplate metrics (the Gopher
repetition rules, Rae et al. 2021 appendix A1.1): documents dominated by
repeated lines or by one repeated word n-gram are machine-generated
boilerplate and get filtered from pretraining corpora.

Metrics (per document):

* ``n_lines`` / ``n_distinct_lines`` — non-empty lines after splitting
  on a separator (default ``\\n``).
* ``dup_line_frac`` — fraction of lines whose content occurs more than
  once: ``(n_lines - n_distinct_lines) / n_lines``.
* ``dup_line_char_frac`` — fraction of line characters inside lines
  whose content occurs more than once (ALL occurrences counted — the
  keep/drop decision cares how much of the doc is boilerplate, not how
  much would survive dedup).
* ``top_bigram`` / ``top_bigram_char_frac`` — the most frequent
  lowercased word 2-gram and the fraction of the document's characters
  its occurrences cover (``count * len(gram) / n_chars``). Ties break
  deterministically on the gram string ascending.

Two implementations with identical results:

* :func:`repetition_features` — the SEMANTIC definition as DataFrame
  ops (explode -> two-level aggregate). Exact, Catalyst-visible, and
  what the ANSI-SQL oracle twin replays; but the explode shuffles a
  (doc_id, line)-grained corpus — wrong shape for 100 TB.
* :func:`repetition_features_vec` — the SCALE path: one ``mapInPandas``
  projection computing every metric inside the scan (pandas C-speed
  split/factorize/groupby per Arrow batch, no per-row Python loops, no
  shuffle at all). Differential-tested equal to the semantic form.

The reference engine has no text-quality surface; this module extends
the training-data-pipeline block alongside functions/text.py
(quality/fingerprint) and functions/decontam.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.text import (
    ASCII_LOWER_TABLE, JAVA_WS_RE,
)

_OUT_SCHEMA = ("n_lines int, n_distinct_lines int, dup_line_frac double, "
               "dup_line_char_frac double, top_bigram string, "
               "top_bigram_char_frac double")


def repetition_features(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        line_sep: str = "\n") -> DataFrame:
    """Semantic (explode + aggregate) form — see module docstring.

    Returns one row per input doc: (id_col, n_lines, n_distinct_lines,
    dup_line_frac, dup_line_char_frac, top_bigram, top_bigram_char_frac).
    Docs with no non-empty lines report 0 lines and 0.0 fractions; docs
    with fewer than two words report NULL top_bigram and 0.0 coverage.

    ``line_sep`` is a LITERAL separator in all three forms (the vec
    kernel and the SQL twin split literally; here it is regex-escaped
    before reaching F.split so a '.'/'|' separator cannot explode into
    a match-anything pattern).
    """
    import re

    from anomaly_detection_spark.functions.decontam import word_ngrams

    base = df.select(id_col, text_col)

    lines = base.select(
        id_col,
        F.explode(F.filter(F.split(F.col(text_col), re.escape(line_sep)),
                           lambda x: x != "")).alias("line"))
    line_counts = (lines.groupBy(id_col, "line")
                   .agg(F.count("*").alias("cnt")))
    line_stats = (line_counts.groupBy(id_col).agg(
        F.sum("cnt").cast("int").alias("n_lines"),
        F.count("*").cast("int").alias("n_distinct_lines"),
        F.sum(F.when(F.col("cnt") > 1,
                     F.col("cnt") * F.length("line")).otherwise(0)
              ).alias("dup_chars"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
    ))

    grams = base.select(
        id_col, F.length(text_col).alias("n_chars"),
        F.explode(word_ngrams(F.col(text_col), 2, distinct=False))
        .alias("gram"))
    gram_counts = (grams.groupBy(id_col, "n_chars", "gram")
                   .agg(F.count("*").alias("cnt")))
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy(
        F.col("cnt").desc(), F.col("gram").asc())
    top = (gram_counts.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select(
               id_col, F.col("gram").alias("top_bigram"),
               (F.col("cnt") * F.length("gram")
                / F.greatest(F.col("n_chars"), F.lit(1))
                ).cast("double").alias("top_bigram_char_frac")))

    all_ids = base.select(id_col).distinct()
    return (all_ids
            .join(line_stats, id_col, "left")
            .join(top, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
                F.coalesce("n_distinct_lines", F.lit(0))
                .alias("n_distinct_lines"),
                F.when(F.coalesce("n_lines", F.lit(0)) > 0,
                       (F.col("n_lines") - F.col("n_distinct_lines"))
                       / F.col("n_lines")).otherwise(0.0)
                .cast("double").alias("dup_line_frac"),
                F.when(F.coalesce("line_chars", F.lit(0)) > 0,
                       F.col("dup_chars") / F.col("line_chars"))
                .otherwise(0.0).cast("double").alias("dup_line_char_frac"),
                "top_bigram",
                F.coalesce("top_bigram_char_frac", F.lit(0.0))
                .alias("top_bigram_char_frac")))


def repetition_features_sql(*, docs_sql: str, id_col: str = "doc_id",
                            text_col: str = "text",
                            line_sep: str = "\n") -> str:
    """DuckDB twin of :func:`repetition_features`."""
    from anomaly_detection_spark.functions.decontam import word_ngrams_sql

    sep = line_sep.replace("'", "''").replace("\n", "\\n")
    grams2 = word_ngrams_sql(text_col, 2, distinct=False)
    return f"""
WITH d AS ({docs_sql}),
lines AS (
  SELECT {id_col}, unnest(list_filter(string_split({text_col}, e'{sep}'),
                                      x -> x <> '')) AS line
  FROM d
),
line_counts AS (
  SELECT {id_col}, line, count(*) AS cnt FROM lines GROUP BY 1, 2
),
line_stats AS (
  SELECT {id_col},
         CAST(sum(cnt) AS INT) AS n_lines,
         CAST(count(*) AS INT) AS n_distinct_lines,
         sum(CASE WHEN cnt > 1 THEN cnt * length(line) ELSE 0 END)
           AS dup_chars,
         sum(cnt * length(line)) AS line_chars
  FROM line_counts GROUP BY 1
),
grams AS (
  SELECT {id_col}, length({text_col}) AS n_chars,
         unnest({grams2}) AS gram
  FROM d
),
gram_counts AS (
  SELECT {id_col}, n_chars, gram, count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3
),
top AS (
  SELECT {id_col}, gram AS top_bigram,
         CAST(cnt * length(gram) AS DOUBLE)
           / greatest(n_chars, 1) AS top_bigram_char_frac
  FROM (SELECT *, row_number() OVER (
          PARTITION BY {id_col} ORDER BY cnt DESC, gram ASC) AS _rn
        FROM gram_counts)
  WHERE _rn = 1
)
SELECT d.{id_col},
       COALESCE(ls.n_lines, 0) AS n_lines,
       COALESCE(ls.n_distinct_lines, 0) AS n_distinct_lines,
       CASE WHEN COALESCE(ls.n_lines, 0) > 0 THEN
         CAST(ls.n_lines - ls.n_distinct_lines AS DOUBLE) / ls.n_lines
       ELSE 0.0 END AS dup_line_frac,
       CASE WHEN COALESCE(ls.line_chars, 0) > 0 THEN
         CAST(ls.dup_chars AS DOUBLE) / ls.line_chars
       ELSE 0.0 END AS dup_line_char_frac,
       top.top_bigram,
       COALESCE(top.top_bigram_char_frac, 0.0) AS top_bigram_char_frac
FROM (SELECT DISTINCT {id_col} FROM d) d
LEFT JOIN line_stats ls USING ({id_col})
LEFT JOIN top USING ({id_col})
"""


def repetition_features_vec(df: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text",
                            line_sep: str = "\n") -> DataFrame:
    """Scale-path form: every metric computed inside the scan with one
    ``mapInPandas`` projection — no shuffle, no per-row Python (pandas
    C kernels: str.split/explode/factorize/groupby over the whole Arrow
    batch). Differential-tested equal to :func:`repetition_features`.
    """
    import numpy as np
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids = pdf[id_col]
            texts = pdf[text_col].fillna("")
            nd = len(pdf)

            # ---- line metrics: explode -> duplicate counting ----
            lines = texts.str.split(line_sep, regex=False).explode()
            lines = lines[lines.notna() & (lines != "")]
            n_lines = np.zeros(nd, dtype=np.int32)
            n_dist = np.zeros(nd, dtype=np.int32)
            dupc = np.zeros(nd, dtype=np.int64)
            totc = np.zeros(nd, dtype=np.int64)
            if len(lines):
                di = lines.index.to_numpy()
                codes, _ = pd.factorize(lines.to_numpy())
                llen = lines.str.len().to_numpy(dtype=np.int64)
                key = pd.DataFrame({"d": di, "c": codes, "L": llen})
                cnts = key.groupby(["d", "c"], sort=False).agg(
                    cnt=("c", "size"), L=("L", "first")).reset_index()
                per = cnts.groupby("d", sort=False).agg(
                    n_lines=("cnt", "sum"), n_dist=("cnt", "size"),
                ).reset_index()
                dup_mask = cnts["cnt"].to_numpy() > 1
                chars = cnts["cnt"].to_numpy() * cnts["L"].to_numpy()
                dpc = pd.DataFrame({
                    "d": cnts["d"], "dup": np.where(dup_mask, chars, 0),
                    "tot": chars}).groupby("d", sort=False).sum()
                n_lines[per["d"].to_numpy()] = per["n_lines"].to_numpy()
                n_dist[per["d"].to_numpy()] = per["n_dist"].to_numpy()
                dupc[dpc.index.to_numpy()] = dpc["dup"].to_numpy()
                totc[dpc.index.to_numpy()] = dpc["tot"].to_numpy()

            # ---- top word-bigram coverage ----
            # explicit Java \s class: Python's \s is Unicode-aware and
            # would split NBSP/U+2000-class spaces the JVM form keeps
            words = (texts.str.translate(ASCII_LOWER_TABLE)
                     .str.split(JAVA_WS_RE, regex=True).explode())
            words = words[words.notna() & (words != "")]
            top_gram = np.full(nd, None, dtype=object)
            top_frac = np.zeros(nd, dtype=np.float64)
            if len(words):
                wdi = words.index.to_numpy()
                warr = words.to_numpy()
                same = wdi[:-1] == wdi[1:]
                if same.any():
                    g_d = wdi[:-1][same]
                    g = pd.Series(warr[:-1][same]).str.cat(
                        pd.Series(warr[1:][same]), sep=" ")
                    gc = (pd.DataFrame({"d": g_d, "g": g.to_numpy()})
                          .groupby(["d", "g"], sort=False)
                          .size().reset_index(name="cnt")
                          .sort_values(["d", "cnt", "g"],
                                       ascending=[True, False, True],
                                       kind="stable")
                          .drop_duplicates("d"))
                    didx = gc["d"].to_numpy()
                    top_gram[didx] = gc["g"].to_numpy()
                    nchars = texts.str.len().to_numpy(dtype=np.int64)
                    glen = gc["g"].str.len().to_numpy(dtype=np.int64)
                    top_frac[didx] = (gc["cnt"].to_numpy() * glen
                                      / np.maximum(nchars[didx], 1))

            yield pd.DataFrame({
                id_col: ids,
                "n_lines": n_lines,
                "n_distinct_lines": n_dist,
                "dup_line_frac": np.where(
                    n_lines > 0, (n_lines - n_dist) / np.maximum(n_lines, 1),
                    0.0),
                "dup_line_char_frac": np.where(
                    totc > 0, dupc / np.maximum(totc, 1), 0.0),
                "top_bigram": top_gram,
                "top_bigram_char_frac": top_frac,
            })

    id_type = df.schema[id_col].dataType.simpleString()
    out = df.select(id_col, text_col)
    # reset index per batch so .explode() keeps positional doc indices
    def reindexed(batches):
        for pdf in batches:
            yield from kernel([pdf.reset_index(drop=True)])

    return out.mapInPandas(
        reindexed, schema=f"`{id_col}` {id_type}, {_OUT_SCHEMA}")
