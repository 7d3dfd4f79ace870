"""Round-3 regression tests: observe-based curation reporting,
sample-without-count model fits, epoch-parallel clustering retrain, and
the derived-invariant recall queries for the LSH/ANN family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _jobs(spark) -> int:
    tracker = spark.sparkContext.statusTracker()
    return len(tracker.getJobIdsForGroup(None) or [])


def test_curate_report_rides_output_job(spark, docs):
    """with_report=True must execute the gate/dedup chain exactly once:
    curate() itself runs one parquet-footer count job (rows_in), the
    consumer's collect runs the chain, and reading the report afterwards
    runs ZERO further jobs (counters arrived as observe metrics)."""
    from anomaly_detection_spark.functions.curation import (
        CurationConfig, curate,
    )

    cfg = CurationConfig(min_quality=0.3,
                         allowed_langs=("en", "de", "fr", "es", "zh"),
                         jaccard_threshold=0.6)
    before = _jobs(spark)
    curated, report = curate(docs.limit(300), config=cfg)
    after_curate = _jobs(spark)
    # only the rows_in count runs at curate() time (a limit+count executes
    # incrementally, so it may account for 2 job ids); the gate/dedup
    # chain itself must NOT run here
    assert after_curate - before <= 2

    n_out = curated.count()            # the consumer's output action
    after_consume = _jobs(spark)

    rows = {r[0]: (r[1], r[2]) for r in report.rows()}
    assert _jobs(spark) == after_consume  # report added no jobs
    # reading the counters released the pipeline's internal persists
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert rows["near_dedup"][1] == n_out
    assert rows["quality_lang_gate"][0] == 300
    # chain consistency: rows_out of each stage == rows_in of the next
    assert rows["quality_lang_gate"][1] == rows["exact_dedup"][0]
    assert rows["exact_dedup"][1] == rows["near_dedup"][0]


def test_curate_report_before_consume_runs_once(spark, docs):
    """Reading the report before any action on curated drives the plan
    exactly once (a count) and later report reads are free."""
    from anomaly_detection_spark.functions.curation import (
        CurationConfig, curate,
    )

    curated, report = curate(
        docs.limit(200),
        config=CurationConfig(min_quality=0.3,
                              allowed_langs=("en", "de", "fr", "es", "zh"),
                              near_dedup=False),
    )
    rows1 = report.rows()
    mid = _jobs(spark)
    rows2 = report.rows()
    assert _jobs(spark) == mid and rows1 == rows2
    assert rows1[1][1] >= rows1[1][2]  # exact_dedup never grows rows


def test_decode_rgb_routes_to_pil_when_available(monkeypatch):
    """_decode_rgb must use PIL when importable (real decode; failures
    surface as ValueError -> decode_ok=False) and fall back to the
    deterministic stub only when PIL is absent (this sandbox)."""
    import sys
    import types

    import numpy as np

    from anomaly_detection_spark.functions import multimodal as mm

    class FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return self

        def __array__(self, dtype=None, copy=None):
            return np.full((4, 4, 3), 7, dtype=np.uint8)

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=lambda b: FakeImg())
    monkeypatch.setitem(sys.modules, "PIL", pil)
    out = mm._decode_rgb(b"anything", 8, 8)
    assert out.shape == (4, 4, 3) and (out == 7).all()  # PIL path, not stub

    pil.Image = types.SimpleNamespace(
        open=lambda b: (_ for _ in ()).throw(OSError("bad image")))
    with pytest.raises(ValueError):
        mm._decode_rgb(b"garbage", 8, 8)

    monkeypatch.delitem(sys.modules, "PIL")
    stub = mm._decode_rgb(b"\x01\x02\x03", 8, 8)
    assert stub.shape == (8, 8, 3)                      # stub tiling path


def test_bounded_sample_rows(spark, docs):
    """Model-fit sampling never runs a count job: bounded result on big
    input, whole table on small input, deterministic across calls."""
    from anomaly_detection_spark.sampling import bounded_sample_rows

    sel = docs.select("doc_id")
    before = _jobs(spark)
    big = bounded_sample_rows(sel, 50)
    assert len(big) == 50
    # one incremental collect (limit may stage 2 job ids), never a count
    assert _jobs(spark) - before <= 2
    assert [r[0] for r in big] == [r[0] for r in bounded_sample_rows(sel, 50)]

    small = bounded_sample_rows(sel.filter(F.col("doc_id") < 20), 50)
    assert len(small) == sel.filter(F.col("doc_id") < 20).count()


def test_streaming_curate_commits_and_resumes(spark, docs, tmp_path):
    """foreachBatch curation end-to-end: audit rows commit across >= 2
    micro-batches; a stopped stream restarted on the same checkpoint
    picks up only new files, never duplicates a committed batch, and the
    curated parquet output matches the ledger's row accounting."""
    from anomaly_detection_spark.audit import AuditLedger
    from anomaly_detection_spark.functions.curation import CurationConfig
    from anomaly_detection_spark.streaming.stream import streaming_curate

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    ledger = AuditLedger(spark, str(tmp_path / "audit"))
    cfg = CurationConfig(min_quality=0.3,
                         allowed_langs=("en", "de", "fr", "es", "zh"),
                         jaccard_threshold=0.6)
    schema = docs.schema

    docs.filter(F.col("doc_id") < 150).write.parquet(in_dir)
    q = streaming_curate(spark, input_dir=in_dir, schema=schema,
                         output_dir=out_dir, checkpoint=ck, ledger=ledger,
                         config=cfg)
    q.processAllAvailable()
    docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)) \
        .write.mode("append").parquet(in_dir)
    q.processAllAvailable()
    q.stop()

    committed = ledger.committed().collect()
    assert {r["partition_key"] for r in committed} >= {"batch_0", "batch_1"}
    n_batches_1 = len(committed)
    assert len({r["partition_key"] for r in committed}) == n_batches_1

    # restart on the same checkpoint: nothing new -> no new commits;
    # a third file -> exactly the new batches commit
    q2 = streaming_curate(spark, input_dir=in_dir, schema=schema,
                          output_dir=out_dir, checkpoint=ck, ledger=ledger,
                          config=cfg)
    q2.processAllAvailable()
    assert len(ledger.committed().collect()) == n_batches_1
    docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)) \
        .write.mode("append").parquet(in_dir)
    q2.processAllAvailable()
    q2.stop()

    final = ledger.committed().collect()
    keys = [r["partition_key"] for r in final]
    assert len(keys) == len(set(keys))          # no duplicate commits
    assert len(final) > n_batches_1
    n_out = spark.read.parquet(out_dir).count()
    assert n_out == sum(r["n_rows"] for r in final)
    assert all(r["verdict"] == "pass" for r in final)


def test_clustering_retrain_epoch_parallel_matches_simulation(spark):
    """The round-3 epoch-parallel clustering retrain must equal a direct
    numpy simulation of the reference recurrence (seeded memory buffer,
    trailing-S trim, fire every R once full) on a long series whose
    buffers straddle the train-file boundary."""
    import numpy as np

    from anomaly_detection_spark.operators.clustering import (
        _core_samples, _min_dist, clustering_retrain_check,
    )

    rng = np.random.default_rng(7)
    n, R, S = 900, 40, 100
    train = rng.normal(scale=3.0, size=(130, 2))
    X = rng.normal(scale=3.0, size=(n, 2))
    eps, min_samples, th = 2.0, 4, 4.0

    # numpy simulation of the sequential reference recurrence
    mem = list(train[-S:])
    seeded = len(mem)
    cores = _core_samples(train, eps, min_samples)
    exp_code, exp_epoch = [], []
    since, epoch = 0, 0
    for i in range(n):
        d = _min_dist(X[i:i + 1], cores)[0]
        exp_code.append(2 if cores is None else (-1 if d >= th else 1))
        exp_epoch.append(epoch)
        mem.append(X[i])
        mem = mem[-S:]
        since += 1
        if since >= R and seeded + i + 1 >= S:
            cores = _core_samples(np.asarray(mem), eps, min_samples)
            since, epoch = 0, epoch + 1

    rows = [("s", float(i), float(v[0]), float(v[1]))
            for i, v in enumerate(X)]
    df = spark.createDataFrame(
        rows, "series string, ts double, f1 double, f2 double")
    got = clustering_retrain_check(
        df, "series", "ts", ["f1", "f2"],
        eps=eps, min_samples=min_samples, treshold=th,
        retrain_interval=R, samples_for_retrain=S, initial_train=train,
    ).orderBy("ts").collect()
    assert [r["code"] for r in got] == exp_code
    assert [r["epoch"] for r in got] == exp_epoch


def test_eager_pair_dedup_leaves_no_cached_plans(spark, docs):
    """eager=True scopes the candidate-set persist: after the call the
    CacheManager holds no plans (localCheckpoint blocks are RDD-level,
    GC-reclaimed), so repeated driver queries can't accumulate caches."""
    from anomaly_detection_spark.functions.dedup import minhash_lsh_pairs

    spark.catalog.clearCache()
    d = docs.limit(150)
    pairs = minhash_lsh_pairs(d, "doc_id", "text", jaccard_threshold=0.5,
                              eager=True)
    assert pairs.count() >= 0
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
