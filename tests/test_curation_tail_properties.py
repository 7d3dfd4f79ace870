"""Property-based differentials for the round-5b vectorized kernels:
hypothesis generates adversarial documents (unicode whitespace, vertical
tabs, empty/short docs, regex metacharacters) and the pandas scale
kernels must match the JVM semantic forms element-exactly. This is
precisely the bug class the round-5b review caught by hand (short-batch
slice misalignment, Python-vs-Java \\s divergence) — these pin it
permanently. One Spark job pair per example, so example counts are
deliberately small."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from anomaly_detection_spark.functions.decontam import (
    word_ngram_pairs_vec, word_ngrams,
)
from anomaly_detection_spark.functions.repetition import (
    repetition_features, repetition_features_vec,
)

# letters + ASCII whitespace (incl. VT, the Java/RE2 divergence char) +
# unicode spaces (NBSP, EN QUAD — Python-\s-only) + regex metachars
_ALPHABET = "ab xy.|\t\n\x0b\f\r\xa0\u2000$()"
_doc = st.text(alphabet=_ALPHABET, min_size=0, max_size=80)
_docs = st.lists(_doc, min_size=1, max_size=5)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string").repartition(1)  # one Arrow batch


@settings(max_examples=25, deadline=None)
@given(_docs, st.sampled_from([2, 3, 8]))
def test_ngram_vec_matches_hof_on_adversarial_text(spark, texts, n):
    df = _df(spark, texts)
    hof = {(r["doc_id"], r["gram"]) for r in
           df.select("doc_id", F.explode(word_ngrams(F.col("text"), n))
                     .alias("gram")).collect()}
    vec = [(r["doc_id"], r["gram"])
           for r in word_ngram_pairs_vec(df, n=n).collect()]
    assert len(vec) == len(set(vec))
    assert set(vec) == hof


@settings(max_examples=15, deadline=None)
@given(_docs)
def test_repetition_vec_matches_semantic_on_adversarial_text(spark, texts):
    df = _df(spark, texts)
    a = {r["doc_id"]: r for r in repetition_features(df).collect()}
    b = {r["doc_id"]: r for r in repetition_features_vec(df).collect()}
    assert set(a) == set(b)
    for k in a:
        ra, rb = a[k], b[k]
        assert (ra["n_lines"], ra["n_distinct_lines"], ra["top_bigram"]) \
            == (rb["n_lines"], rb["n_distinct_lines"], rb["top_bigram"]), k
        for c in ("dup_line_frac", "dup_line_char_frac",
                  "top_bigram_char_frac"):
            assert abs(ra[c] - rb[c]) < 1e-9, (k, c)
