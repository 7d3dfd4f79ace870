"""In-suite Spark<->DuckDB oracle parity on a representative sample of the
driver contract (the full sweep is tools/check_oracles.py; this keeps the
`python -m pytest -x -q` gate exercising the cross-engine compare)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracles import TABLES, canon

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    "flagship_pricing_summary",       # agg
    "welford_suite_events",           # window + expanding window
    "ema_suite_events",               # applyInPandas recurrence + quantile
    "robust_window_suite_events",     # list-window median/MAD + percentile
    "iforest_embeddings",             # planted-invariant (round 4)
    "drift_suite",                    # merged drift verdicts (round 4)
    "asof_band_check_events",         # as-of join
    "partition_verdicts_documents",   # audit-shaped verdicts
    "lang_id_documents",              # text expressions
    "cosine_topk_embeddings",         # similarity
    "minhash_near_dup_documents",     # LSH recall derived-invariant
    "lsh_topk_embeddings",            # ANN recall derived-invariant
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, ddb, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    cur = ddb.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert canon(srows, sdf.columns) == canon(orows, ocols)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns
