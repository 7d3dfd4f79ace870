"""Schema validation: metadata diff + completeness verdicts."""

from anomaly_detection_spark.corpus import generate_code_corpus
from anomaly_detection_spark.operators.schema import (
    ColumnSpec,
    SchemaSpec,
    completeness_check,
    schema_code,
    schema_findings,
)

CORPUS_DDL = ("row_id bigint, repo string, path string, commit string, "
              "lang string, content string")


def test_schema_clean(spark):
    df = generate_code_corpus(spark, 100)
    spec = SchemaSpec.from_ddl(CORPUS_DDL)
    assert schema_findings(df, spec) == []
    assert schema_code(df, spec) == 1


def test_schema_violations(spark):
    df = generate_code_corpus(spark, 100).drop("path").withColumnRenamed(
        "lang", "language"
    )
    spec = SchemaSpec.from_ddl(CORPUS_DDL, allow_extra=False)
    f = {(x["column"], x["kind"]) for x in schema_findings(df, spec)}
    assert ("path", "missing") in f
    assert ("lang", "missing") in f
    assert ("language", "extra") in f
    assert schema_code(df, spec) == -1


def test_schema_type_mismatch(spark):
    from pyspark.sql import functions as F

    df = generate_code_corpus(spark, 100).withColumn(
        "row_id", F.col("row_id").cast("string")
    )
    spec = SchemaSpec.from_ddl(CORPUS_DDL)
    kinds = {x["kind"] for x in schema_findings(df, spec)}
    assert "type_mismatch" in kinds
    assert schema_code(df, spec) == -1


def test_completeness_check(spark):
    df = generate_code_corpus(spark, 25_000)  # planted NULL path ~1/8009
    spec = SchemaSpec(columns=[
        ColumnSpec("path", "string", max_null_rate=1e-6),   # should fail
        ColumnSpec("repo", "string", max_null_rate=0.01),   # clean
        ColumnSpec("content", "string", max_null_rate=0.5),
    ])
    got = {r["column"]: r for r in completeness_check(df, spec).collect()}
    assert got["path"]["code"] == -1 and got["path"]["null_rate"] > 0
    assert got["repo"]["code"] == 1 and got["repo"]["null_rate"] == 0.0
    assert got["content"]["code"] == 1
