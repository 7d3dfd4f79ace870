"""Corpus generation parity + the flagship constraint suite with
violation-row sha256 parity against the pure-Python mirror (the
BASELINE.json per-row invariant)."""

import hashlib

from pyspark.sql import functions as F

from anomaly_detection_spark import corpus
from anomaly_detection_spark.operators.constraints import corpus_constraint_codes

N = 3000  # covers at least one planted violation of several kinds


def test_spark_python_row_parity(spark):
    df = corpus.generate_code_corpus(spark, N)
    got = {r["row_id"]: r.asDict() for r in df.collect()}
    for i in [0, 1, 11, 7, 3, 5, 9, 13, 100, 2999]:
        assert got[i] == corpus.py_row(i), f"row {i} mismatch"


def test_violation_sha256_parity(spark):
    """Flagged rows' sha256(content) must equal the Python mirror's flagged
    set, row-for-row (north-rule invariant)."""
    df = corpus.generate_code_corpus(spark, N)
    checks = corpus_constraint_codes(df)
    exp = corpus.expected_violation_ids(N)

    # null path -> Undefined on c_path_not_null
    null_ids = [r["row_id"] for r in
                checks.filter(F.col("c_path_not_null") == 2).collect()]
    assert sorted(null_ids) == exp["null_path"]

    # malformed commit -> Error on c_commit_format
    bad_commit = [r["row_id"] for r in
                  checks.filter(F.col("c_commit_format") == -1).collect()]
    assert sorted(bad_commit) == exp["bad_commit"]

    # unknown lang -> Error on c_lang_domain
    bad_lang = [r["row_id"] for r in
                checks.filter(F.col("c_lang_domain") == -1).collect()]
    assert sorted(bad_lang) == exp["bad_lang"]

    # border violations (empty below LL=10, huge above UL=50000) — compare
    # the sha256 SET of flagged rows against the python mirror
    flagged = checks.filter(F.col("c_content_len_border") == -1) \
                    .select("row_id", "content_sha256").collect()
    got_sha = {r["content_sha256"] for r in flagged}
    exp_ids = exp["empty"] + exp["huge"]
    exp_sha = {hashlib.sha256(corpus.py_content(i).encode()).hexdigest()
               for i in exp_ids}
    assert got_sha == exp_sha
    assert sorted(r["row_id"] for r in flagged) == sorted(exp_ids)


def test_duplicate_keys_planted(spark):
    df = corpus.generate_code_corpus(spark, N)
    dups = (df.groupBy("repo", "path", "commit").count()
              .filter(F.col("count") > 1))
    exp = corpus.expected_violation_ids(N)
    assert dups.count() == len(exp["dup"])
