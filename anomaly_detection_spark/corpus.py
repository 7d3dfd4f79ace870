"""Deterministic synthetic source-code corpus (the engine's primary input).

Schema per BASELINE.json ``input_hint``:
    (repo: string, path: string, commit: string, lang: string, content: string)

Generation is **fully distributed**: every column is a pure Catalyst
expression over ``spark.range(n)`` (md5-of-id derived), so the same code
generates 10k rows in a unit test or 10^12 rows on a 1000-executor cluster
with zero driver-side data and linear scaling. Repo keys are skewed
(power-law via u^3 mapping) to exercise the salting / AQE-skew paths.

Planted violations (deterministic row positions, reproducible in pure
Python via :func:`expected_violation_ids` for sha256 row-parity tests —
mirrors the seeded-fixture strategy of the reference's unit tests,
/root/reference/src/unit_tests.py:68-129):

    id % 8009  == 11 -> NULL path                 (not-null constraint)
    id % 9973  == 7  -> malformed commit          (regex/arity constraint)
    id % 7919  == 3  -> lang = 'klingon'          (referential constraint)
    id % 10007 == 5  -> empty content             (border: below LL)
    id % 20011 == 9  -> huge content (100k chars) (border: above UL)
    id % 6007  == 13 -> (repo,path,commit) duplicated from id-1 (uniqueness)
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = [
    "scan", "filter", "join", "agg", "shuffle", "batch", "column", "row",
    "hash", "merge", "sort", "spill", "codegen", "vector", "sketch", "plan",
]

LANGS = ["python", "java", "go", "js", "rust", "c", "md"]
# cumulative weights for a skewed categorical draw (python hot)
_LANG_CUM = [0.40, 0.60, 0.72, 0.84, 0.92, 0.97, 1.0]

N_REPOS_DEFAULT = 200

# planted-violation moduli (see module docstring)
MOD_NULL_PATH = (8009, 11)
MOD_BAD_COMMIT = (9973, 7)
MOD_BAD_LANG = (7919, 3)
MOD_EMPTY = (10007, 5)
MOD_HUGE = (20011, 9)
MOD_DUP = (6007, 13)

HUGE_LEN = 100_000
LEN_LO, LEN_SPAN = 5.0, 3.0  # L = floor(exp(LO + SPAN*u)), u uniform [0,1)


def _is(col, mod_off):
    mod, off = mod_off
    return F.pmod(col, F.lit(mod)) == F.lit(off)


def _py_is(i: int, mod_off) -> bool:
    mod, off = mod_off
    return i % mod == off


def _content_len_from_hash(hex8: str) -> int:
    u = int(hex8, 16) / float(16**8)
    return int(math.floor(math.exp(LEN_LO + LEN_SPAN * u)))


def generate_code_corpus(
    spark: SparkSession, n_rows: int, n_repos: int = N_REPOS_DEFAULT
) -> DataFrame:
    """Build the corpus as a lazily-evaluated distributed DataFrame."""
    df = spark.range(n_rows).withColumnRenamed("id", "row_id")
    rid = F.col("row_id")

    # duplicates borrow the key-generating id of the previous row
    key_id = F.when(_is(rid, MOD_DUP) & (rid > 0), rid - 1).otherwise(rid)
    key_str = key_id.cast("string")
    rid_str = rid.cast("string")

    # --- repo: skewed key. u^3 concentrates mass near repo 0 (hot repos).
    u_repo = (
        F.conv(F.substring(F.md5(F.concat(F.lit("r"), key_str)), 1, 8), 16, 10)
        .cast("double") / float(16**8)
    )
    repo_idx = F.floor(F.pow(u_repo, F.lit(3.0)) * n_repos).cast("int")
    repo = F.concat(F.lit("org"), (repo_idx % 20).cast("string"),
                    F.lit("/repo"), repo_idx.cast("string"))

    # --- lang: weighted categorical + planted invalid value
    u_lang = (
        F.conv(F.substring(F.md5(F.concat(F.lit("l"), rid_str)), 1, 8), 16, 10)
        .cast("double") / float(16**8)
    )
    lang_expr = None
    for lang_name, cum in zip(LANGS, _LANG_CUM):
        cond = u_lang < cum
        lang_expr = F.when(cond, F.lit(lang_name)) if lang_expr is None \
            else lang_expr.when(cond, F.lit(lang_name))
    lang_expr = lang_expr.otherwise(F.lit(LANGS[-1]))
    lang = F.when(_is(rid, MOD_BAD_LANG), F.lit("klingon")).otherwise(lang_expr)

    # --- path (nullable violation planted)
    h_path = F.md5(F.concat(F.lit("p"), key_str))
    path_ok = F.concat(
        F.lit("src/"), F.substring(h_path, 1, 6), F.lit("/"),
        F.substring(h_path, 7, 8), F.lit("_"), key_str, F.lit(".txt"),
    )
    path = F.when(_is(rid, MOD_NULL_PATH), F.lit(None).cast("string")).otherwise(path_ok)

    # --- commit: 40-char lowercase hex; malformed planting
    commit_ok = F.concat(
        F.md5(F.concat(F.lit("c"), key_str)),
        F.substring(F.md5(F.concat(F.lit("c2"), key_str)), 1, 8),
    )
    commit = F.when(_is(rid, MOD_BAD_COMMIT), F.upper(F.substring(commit_ok, 1, 12))).otherwise(commit_ok)

    # --- content: word salad from md5 nibbles, length lognormal-ish.
    # One SQL expression (substring's length argument must be an expression,
    # so the whole formula is rendered as expr()).
    content = F.expr(
        "substring(repeat(concat(array_join(transform(split(substring(md5(concat('w', cast(row_id as string))), 1, 32), '(?!$)'),"
        " ch -> element_at(array({words}), (cast(conv(ch, 16, 10) as int) % {nw}) + 1)), ' '), ' '), 600), 1, "
        "CASE WHEN pmod(row_id, {em}) = {eo} THEN 0 WHEN pmod(row_id, {hm}) = {ho} THEN {hl} "
        "ELSE cast(floor(exp({lo} + {span} * (cast(conv(substring(md5(concat('n', cast(row_id as string))), 1, 8), 16, 10) as double) / {den}))) as int) END)".format(
            words=",".join(f"'{w}'" for w in WORDS), nw=len(WORDS),
            em=MOD_EMPTY[0], eo=MOD_EMPTY[1], hm=MOD_HUGE[0], ho=MOD_HUGE[1],
            hl=HUGE_LEN, lo=LEN_LO, span=LEN_SPAN, den=float(16**8),
        )
    )

    return df.select(
        F.col("row_id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


# ---------------------------------------------------------------------------
# Pure-Python mirror (for sha256 row-parity tests at tiny scale only).
# ---------------------------------------------------------------------------

def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def py_content(i: int) -> str:
    """Exact Python replica of the Spark `content` expression for row i."""
    h1 = _md5(f"w{i}")
    phrase = " ".join(WORDS[int(ch, 16) % len(WORDS)] for ch in h1)
    if _py_is(i, MOD_EMPTY):
        length = 0
    elif _py_is(i, MOD_HUGE):
        length = HUGE_LEN
    else:
        length = _content_len_from_hash(_md5(f"n{i}")[:8])
    repeated = (phrase + " ") * 600
    return repeated[:length]


def py_row(i: int, n_repos: int = N_REPOS_DEFAULT) -> dict:
    key = i - 1 if (_py_is(i, MOD_DUP) and i > 0) else i
    u_repo = int(_md5(f"r{key}")[:8], 16) / float(16**8)
    repo_idx = int(math.floor(u_repo**3 * n_repos))
    u_lang = int(_md5(f"l{i}")[:8], 16) / float(16**8)
    lang = LANGS[-1]
    for name, cum in zip(LANGS, _LANG_CUM):
        if u_lang < cum:
            lang = name
            break
    if _py_is(i, MOD_BAD_LANG):
        lang = "klingon"
    h_path = _md5(f"p{key}")
    path = None if _py_is(i, MOD_NULL_PATH) else (
        f"src/{h_path[:6]}/{h_path[6:14]}_{key}.txt"
    )
    commit = _md5(f"c{key}") + _md5(f"c2{key}")[:8]
    if _py_is(i, MOD_BAD_COMMIT):
        commit = commit[:12].upper()
    return {
        "row_id": i,
        "repo": f"org{repo_idx % 20}/repo{repo_idx}",
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": py_content(i),
    }


def expected_violation_ids(n_rows: int) -> dict:
    """Deterministic planted-violation row ids, per constraint kind."""
    out = {"null_path": [], "bad_commit": [], "bad_lang": [], "empty": [],
           "huge": [], "dup": []}
    for i in range(n_rows):
        if _py_is(i, MOD_NULL_PATH):
            out["null_path"].append(i)
        if _py_is(i, MOD_BAD_COMMIT):
            out["bad_commit"].append(i)
        if _py_is(i, MOD_BAD_LANG):
            out["bad_lang"].append(i)
        if _py_is(i, MOD_EMPTY):
            out["empty"].append(i)
        if _py_is(i, MOD_HUGE):
            out["huge"].append(i)
        if _py_is(i, MOD_DUP) and i > 0:
            out["dup"].append(i)
    return out
