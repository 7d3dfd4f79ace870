"""Text-analysis functions for large-scale training-data pipelines:
token counting, quality scoring, n-gram language ID, and rolling-hash
document fingerprinting.

Everything here is a pure Catalyst Column expression (whole-stage
codegen'd, pushdown-friendly); each builder has an ANSI-SQL twin in
``*_sql`` form so the DuckDB oracle can run the byte-identical formula.
Counting substrings uses the replace-length trick
(len(s) - len(replace(s, kw, ''))) / len(kw) — identical semantics in
Spark SQL and DuckDB, no engine-specific regex dialects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny public stopword seed lists (top function words per language).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " la ", " que ", " los ", " es "],
    "it": [" il ", " che ", " di ", " la ", " per "],
    "pt": [" o ", " que ", " do ", " da ", " em "],
}


# ---------------------------------------------------------------------------
# whitespace: THE load-bearing cross-engine constant
# ---------------------------------------------------------------------------
# Java's default \s is exactly [ \t\n\x0B\f\r]; Python's re \s is
# Unicode-aware (adds NBSP/U+2000-class spaces) and RE2's \s lacks
# vertical tab — so every pandas kernel and every DuckDB oracle that
# must tokenize identically to a JVM expression spells the class out
# from this ONE definition (CLAUDE.md regex-parity rule; PLANS.md
# round-5b review lessons). Raw strings: the backslash sequences reach
# each regex engine verbatim.
JAVA_WS_CHARS = r" \t\n\x0b\f\r"
JAVA_WS_RE = rf"[{JAVA_WS_CHARS}]+"

# ASCII-only case folding for columns whose FOLDED VALUE becomes an
# aggregation/join key compared cross-engine: full Unicode lower() is
# engine-dependent (measured: Spark lower('İ') -> 'i̇' (i+U+0307) and
# lower('ΣΣ') -> 'σς' final-sigma, DuckDB -> 'i'/'σσ'), so any oracle
# whose word/gram keys pass through lower() diverges on such input.
# Per-codepoint translate over the ASCII range is bit-identical in
# Spark, DuckDB, and Python; non-ASCII case is treated as content.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
ASCII_LOWER_TABLE = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)


def ascii_lower(text: Column) -> Column:
    return F.translate(text, _ASCII_UPPER, _ASCII_LOWER)


def ascii_lower_sql(col: str) -> str:
    return f"translate({col}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def ws_token_count(text: Column) -> Column:
    """Whitespace tokens: size of split on runs of whitespace, empty string
    -> 0 (split('') yields one empty token; filter it)."""
    return F.size(F.filter(F.split(F.trim(text), JAVA_WS_RE),
                           lambda t: t != ""))


def ws_token_count_sql(col: str) -> str:
    return (f"len(list_filter(string_split_regex(trim({col}), "
            f"'{JAVA_WS_RE}'), t -> t <> ''))")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: word tokens plus one extra token per 6 chars of
    long words (a public rule-of-thumb approximation of subword splits;
    ~= GPT-style 'one token per ~4 chars of English' for code-mixed text)."""
    words = F.filter(F.split(F.trim(text), JAVA_WS_RE), lambda t: t != "")
    extra = F.aggregate(
        words, F.lit(0),
        lambda acc, w: acc + F.floor(F.length(w) / 6).cast("int"),
    )
    return ws_token_count(text) + extra


def bpe_ish_token_count_sql(col: str) -> str:
    return (
        f"{ws_token_count_sql(col)} + list_sum(list_transform("
        f"list_filter(string_split_regex(trim({col}), '{JAVA_WS_RE}'), "
        f"t -> t <> ''), w -> CAST(floor(len(w) / 6) AS INT)))"
    )


# ---------------------------------------------------------------------------
# counting helper (replace-length trick — identical in Spark SQL & DuckDB)
# ---------------------------------------------------------------------------

def count_occurrences(text: Column, needle: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def count_occurrences_sql(col: str, needle: str) -> str:
    esc = needle.replace("'", "''")
    return (f"CAST((length({col}) - length(replace({col}, '{esc}', ''))) "
            f"/ {len(needle)} AS INT)")


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_features(text: Column) -> dict[str, Column]:
    """Heuristic doc-quality signals (Gopher/C4-style public rules):
    length, mean word length, symbol ratio, stopword hit rate, uppercase
    ratio — each a plain expression."""
    n = F.length(text)
    words = ws_token_count(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    sym = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    stop_hits = None
    for kw in LANG_MARKERS["en"]:
        c = count_occurrences(F.lower(text), kw)
        stop_hits = c if stop_hits is None else stop_hits + c
    return {
        "n_chars": n,
        "n_words": words,
        "mean_word_len": (alpha / F.greatest(words, F.lit(1))).cast("double"),
        "symbol_ratio": (sym / F.greatest(n, F.lit(1))).cast("double"),
        "upper_ratio": (upper / F.greatest(alpha, F.lit(1))).cast("double"),
        "stopword_hits": stop_hits.cast("int"),
    }


def quality_score(text: Column, *, min_chars: int = 50,
                  max_symbol_ratio: float = 0.3) -> Column:
    """Composite [0,1] quality score: penalize too-short docs, symbol soup,
    and all-caps; reward stopword presence (natural-language likelihood)."""
    f = quality_features(text)
    len_ok = F.least(f["n_chars"] / F.lit(float(min_chars)), F.lit(1.0))
    sym_pen = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - f["symbol_ratio"] / F.lit(max_symbol_ratio),
    )
    caps_pen = F.lit(1.0) - F.least(f["upper_ratio"], F.lit(1.0))
    stop_bonus = F.least(f["stopword_hits"] / F.greatest(
        f["n_words"] / 10.0, F.lit(1.0)), F.lit(1.0))
    return ((len_ok + sym_pen + caps_pen + stop_bonus) / 4.0).cast("double")


# ---------------------------------------------------------------------------
# language ID (marker-count heuristic)
# ---------------------------------------------------------------------------

def lang_id(text: Column) -> Column:
    """argmax over per-language marker-hit counts; 'und' when no marker
    fires. Deterministic tie-break: language order in LANG_MARKERS."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = []
    for lang, kws in LANG_MARKERS.items():
        s = None
        for kw in kws:
            c = count_occurrences(padded, kw)
            s = c if s is None else s + c
        scores.append((lang, s))
    best_score = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        expr = F.when(s == best_score, F.lit(lang)).otherwise(expr)
    return F.when(best_score <= 0, F.lit("und")).otherwise(expr)


def lang_id_sql(col: str) -> str:
    padded = f"(' ' || lower({col}) || ' ')"
    score_sqls = {
        lang: " + ".join(count_occurrences_sql(padded, kw) for kw in kws)
        for lang, kws in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"({s})" for s in score_sqls.values()) + ")"
    whens = " ".join(
        f"WHEN ({score_sqls[lang]}) = {best} THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"CASE WHEN {best} <= 0 THEN 'und' {whens} ELSE 'und' END"


# ---------------------------------------------------------------------------
# rolling-hash fingerprint
# ---------------------------------------------------------------------------

def fingerprint(text: Column, *, k: int = 8) -> Column:
    """Document fingerprint = min over rolling k-gram hashes (the 'winnowing
    lite' min-hash of character shingles): order-invariant under
    concatenation shifts, cheap to compare for near-identity. Implemented
    with higher-order functions — sequence over start offsets, hash each
    k-gram, array_min. Docs shorter than k hash whole.

    NB: HOF lambdas are interpreted per element; the sf1 bench measured
    this linear-with-a-bad-constant (18.7s / 50k docs). Use
    :func:`rolling_fingerprint` — the Arrow-vectorized Rabin-Karp
    kernel — on any real corpus; this Column form stays for
    zero-Python-allowed contexts."""
    n = F.length(text)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(starts, lambda i: F.xxhash64(F.substring(text, i, k)))
    return F.when(
        text.isNull() | (n <= 0), F.lit(None).cast("bigint")
    ).otherwise(F.array_min(grams))


FNV64_PRIME = 1099511628211  # 0x100000001B3 — public FNV-1 64-bit prime


def rolling_fingerprint(df, id_col: str, text_col: str, *, k: int = 8,
                        out: str = "fp"):
    """Vectorized document fingerprint: min over rolling k-gram
    Rabin-Karp hashes h = Horner(codepoints) * FNV64_PRIME mod 2^64.
    Whole-batch numpy — each Arrow batch's texts concatenate into ONE
    uint32 codepoint array, the k Horner passes are k vectorized
    multiply-adds over the full array (uint64 wraparound is exact mod
    2^64), doc-straddling windows are masked, and per-doc minima come
    from one ``np.minimum.reduceat``. Zero per-row Python on the long
    path; docs shorter than k (rare) hash whole in a scalar loop.
    NULL/empty text -> NULL. Returns (id_col, out bigint) — the hash is
    reinterpreted as SIGNED 64-bit so engines without unsigned types
    (Spark, DuckDB BIGINT) can carry it losslessly.

    Scale: one narrow mapInPandas projection, no shuffle; replaces the
    interpreted-HOF form measured 10x slower per char (sf1 bench,
    BENCH/BASELINE.md round-5 data-scaling section)."""
    import numpy as np
    import pandas as pd

    M = np.uint64(FNV64_PRIME)
    kk = int(k)

    def kernel(batches):
        for pdf in batches:
            texts = pdf[text_col]
            valid = texts.notna() & (texts.str.len() > 0)
            outcol = pd.array([None] * len(pdf), dtype="Int64")
            ts = texts[valid].tolist()
            if ts:
                lens = np.array([len(t) for t in ts], dtype=np.int64)
                c = np.frombuffer("".join(ts).encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.uint64)
                N = len(c)
                off = np.concatenate(([0], np.cumsum(lens)))
                res = np.zeros(len(ts), dtype=np.uint64)
                long_d = lens >= kk
                W = N - kk + 1
                if W > 0 and long_d.any():
                    h = np.zeros(W, dtype=np.uint64)
                    for j in range(kk):
                        h = h * M + c[j: j + W]
                    di = np.repeat(np.arange(len(ts)), lens)
                    h[di[:W] != di[kk - 1:]] = np.uint64(
                        0xFFFFFFFFFFFFFFFF)   # doc-straddling windows
                    mins = np.minimum.reduceat(
                        h, np.minimum(off[:-1], W - 1))
                    res[long_d] = mins[long_d]
                for d in np.flatnonzero(~long_d):
                    # rare short-doc path: Python ints (numpy warns on
                    # uint64 SCALAR overflow; array ops above are silent)
                    hh = 0
                    for ch in c[off[d]: off[d + 1]].tolist():
                        hh = (hh * FNV64_PRIME + ch) % (1 << 64)
                    res[d] = np.uint64(hh)
                outcol[valid.to_numpy()] = res.view(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], out: outcol})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"`{id_col}` {id_type}, `{out}` bigint")


def char_shingles(text: Column, *, k: int = 8) -> Column:
    """Distinct character k-shingles as an array column (MinHash input)."""
    n = F.length(text)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(n <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(starts, lambda i: F.substring(text, i, k)))
    )


def lang_id_scored(df, text_col: str, out: str = "lang_pred"):
    """DataFrame-level language ID: materializes the padded text and each
    language's marker score as intermediate columns so the (expensive)
    lowercase/pad pass and the per-language counts are each evaluated
    ONCE — the pure-Column :func:`lang_id` inlines them ~2x per marker
    per comparison, which bloats codegen for wide marker sets."""
    from pyspark.sql import functions as F

    scored = df.withColumn(
        "_padded", F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    )
    score_cols = []
    for lang, kws in LANG_MARKERS.items():
        s = None
        for kw in kws:
            c = count_occurrences(F.col("_padded"), kw)
            s = c if s is None else s + c
        scored = scored.withColumn(f"_s_{lang}", s)
        score_cols.append(f"_s_{lang}")
    best = F.greatest(*[F.col(c) for c in score_cols])
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(F.col(f"_s_{lang}") == best, F.lit(lang)).otherwise(expr)
    result = F.when(best <= 0, F.lit("und")).otherwise(expr)
    return scored.withColumn(out, result).drop("_padded", *score_cols)
