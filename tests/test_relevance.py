"""Semantic tests for the relevance/quality family
(operators/relevance.py), line-level dedup, the prefix-filter
similarity join, and the Bloom filter — hand-checkable toy corpora
plus brute-force cross-checks for the completeness claims."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dataframe_sql_spark.functions.sketches import bloom_build, bloom_probe
from dataframe_sql_spark.operators.dedup import line_dedup, prefix_filter_pairs
from dataframe_sql_spark.operators.relevance import (
    bigram_lm_scores,
    bm25_scores,
    pmi_bigrams,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry banana date"),
        (3, "apple apple apple elder"),
        (4, "fig grape fig cherry"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --------------------------------------------------------------------------
# TF-IDF
# --------------------------------------------------------------------------


def test_tfidf_hand_computed(toy_docs):
    out = tfidf_top_terms(toy_docs, "doc_id", "text", k=2)
    rows = {(r.doc_id, r.rn): r for r in out.collect()}
    # doc 3: tf(apple)=3 df(apple)=2  -> 3*(ln(5/3)+1)=4.532508
    # elder: tf=1 df=1 -> ln(5/2)+1=1.916291
    top = rows[(3, 1)]
    assert top.word == "apple" and top.tf == 3 and top.df == 2
    assert top.score == pytest.approx(3 * (math.log(5 / 3) + 1), abs=1e-6)
    assert rows[(3, 2)].word == "elder"
    # every doc contributes exactly k rows (ties broken by word)
    assert out.count() == 8


def test_tfidf_rare_term_beats_common_at_equal_tf(toy_docs):
    out = tfidf_top_terms(toy_docs, "doc_id", "text", k=3)
    doc2 = {r.word: r for r in out.collect() if r.doc_id == 2}
    # banana tf=2 beats date tf=1 despite date being rarer
    assert doc2["banana"].score > doc2["date"].score
    # cherry (df=3) vs date (df=1), both tf=1: rarer wins
    assert doc2["date"].score > doc2["cherry"].score


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def test_bm25_matches_and_monotonicity(toy_docs):
    out = bm25_scores(toy_docs, "doc_id", "text", ["apple", "date"])
    rows = {r.doc_id: r for r in out.collect()}
    # docs 4 has neither term -> absent
    assert set(rows) == {1, 2, 3}
    assert rows[2].n_terms_hit == 1  # date only
    assert rows[1].n_terms_hit == 1 and rows[3].n_terms_hit == 1
    # doc 3 (tf(apple)=3) outscores doc 1 (tf=1), same doc length
    assert rows[3].score > rows[1].score
    # idf: 'date' (df=1) term contributes more than 'apple' (df=2) at tf=1
    assert rows[2].score > rows[1].score


def test_bm25_exact_value(toy_docs):
    out = bm25_scores(toy_docs, "doc_id", "text", ["date"])
    row = out.collect()[0]
    # N=4 docs with tokens, df=1, tf=1, dl=4, avgdl=4
    idf = math.log(1 + (4 - 1 + 0.5) / 1.5)
    expected = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 1.0))
    assert row.doc_id == 2
    assert row.score == pytest.approx(round(expected, 6), abs=1e-6)


# --------------------------------------------------------------------------
# PMI
# --------------------------------------------------------------------------


def test_pmi_prefers_exclusive_pair(spark):
    rows = [(i, "zig zag " + "noise%d other%d " % (i, i) * 3) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # min_count=4 prunes the within-doc noise bigrams (count 3), leaving
    # the corpus-wide exclusive pair
    out = pmi_bigrams(df, "doc_id", "text", min_count=4, top=10).collect()
    assert out, "expected at least one collocation"
    best = out[0]
    # 'zig zag' co-occur always and exclusively -> top PMI
    assert (best.w1, best.w2) == ("zig", "zag")
    assert best.c_xy == 6 and best.c_x == 6 and best.c_y == 6


def test_pmi_min_count_prunes(toy_docs):
    out = pmi_bigrams(toy_docs, "doc_id", "text", min_count=3, top=10)
    assert out.count() == 0  # no bigram repeats 3x in the toy corpus


# --------------------------------------------------------------------------
# bigram LM scoring
# --------------------------------------------------------------------------


def test_lm_scores_repetitive_doc_higher(spark):
    corpus = [(i, "the cat sat on the mat") for i in range(5)]
    corpus.append((100, "zebra quark xylophone vortex numbat jackal"))
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_lm_scores(df, "doc_id", "text").collect()}
    # corpus-typical doc scores higher (less negative) than the outlier
    assert out[0].avg_logp > out[100].avg_logp
    assert out[0].n_bigrams == 5 and out[100].n_bigrams == 5


def test_lm_score_exact_single_doc(spark):
    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    row = bigram_lm_scores(df, "doc_id", "text").collect()[0]
    # bigrams: ab, ba, ab ; c12(ab)=2 c12(ba)=1 ; c1(a)=2 c1(b)=2 ; V=2
    lp = (
        math.log((2 + 0.5) / (2 + 0.5 * 2)) * 2
        + math.log((1 + 0.5) / (2 + 0.5 * 2))
    ) / 3
    assert row.n_bigrams == 3
    assert row.avg_logp == pytest.approx(round(lp, 6), abs=1e-6)


# --------------------------------------------------------------------------
# line-level dedup
# --------------------------------------------------------------------------


def test_line_dedup_strips_boilerplate(spark):
    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"{boiler}\nunique prose one\nmore unique text"),
        (2, f"{boiler}\ncompletely different body"),
        (3, "no boilerplate here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1].clean_text == "unique prose one\nmore unique text"
    assert out[1].n_removed == 1 and out[1].n_kept == 2
    assert out[2].clean_text == "completely different body"
    assert out[3].n_removed == 0 and out[3].clean_text == rows[2][1]


def test_line_dedup_short_lines_survive(spark):
    rows = [(1, "ok\nbody one"), (2, "ok\nbody two")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, "doc_id", "text", min_chars=5).collect()}
    # 'ok' repeats but is under min_chars -> kept in both docs
    assert out[1].clean_text == "ok\nbody one"
    assert out[2].n_removed == 0


def test_line_dedup_order_preserved(spark):
    shared = "shared line"
    text = "\n".join(f"l{i}" if i % 2 else shared for i in range(6))
    df = spark.createDataFrame([(1, text), (2, shared)], ["doc_id", "text"])
    out = {r.doc_id: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1].clean_text == "l1\nl3\nl5"
    assert out[2].clean_text == "" and out[2].n_kept == 0


# --------------------------------------------------------------------------
# prefix-filter similarity join: completeness vs brute force
# --------------------------------------------------------------------------


def test_prefix_filter_equals_brute_force(spark):
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_pairs(
            docs, "doc_id", "text", t_num=6, t_den=10
        ).collect()
    }
    # brute force: every pair, exact jaccard
    from dataframe_sql_spark.operators.dedup import shingle_frame

    sh = shingle_frame(docs, "doc_id", "text")
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("i", F.size(F.array_intersect("sa", "sb")))
        .withColumn("u", F.size(F.array_union("sa", "sb")))
        .filter(F.col("i") * 10 >= F.col("u") * 6)
    )
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got == want  # recall 1.0 AND no spurious pairs


def test_prefix_filter_integer_threshold(spark):
    # J exactly at threshold is kept (>=, exact integer arithmetic)
    rows = [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i k")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # 3-shingles: 8 each, 7 shared -> J = 7/9
    out = prefix_filter_pairs(df, "doc_id", "text", t_num=7, t_den=9).collect()
    assert len(out) == 1 and out[0].inter == 7 and out[0].uni == 9
    out2 = prefix_filter_pairs(df, "doc_id", "text", t_num=8, t_den=9).collect()
    assert out2 == []


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    ref = spark.createDataFrame([(f"key{i}",) for i in range(200)], ["k"])
    bits = bloom_build(ref, "k")
    probe = spark.createDataFrame(
        [(i, f"key{i}") for i in range(300)], ["id", "k"]
    )
    out = {r.id: r.maybe_seen for r in bloom_probe(probe, bits, "id", "k").collect()}
    # every key the filter was built from MUST be flagged
    assert all(out[i] for i in range(200))


def test_bloom_rejects_most_unseen(spark):
    ref = spark.createDataFrame([(f"key{i}",) for i in range(100)], ["k"])
    bits = bloom_build(ref, "k")
    probe = spark.createDataFrame(
        [(i, f"other{i}") for i in range(500)], ["id", "k"]
    )
    flagged = (
        bloom_probe(probe, bits, "id", "k").filter("maybe_seen").count()
    )
    # m=2^20 bits, 500 inserted positions: fp rate ~ (500/2^20)^5 ~ 0 —
    # allow a generous margin anyway
    assert flagged <= 2


def test_bloom_union_merge(spark):
    a = bloom_build(spark.createDataFrame([("x1",), ("x2",)], ["k"]), "k")
    b = bloom_build(spark.createDataFrame([("y1",)], ["k"]), "k")
    merged = a.union(b).distinct()
    probe = spark.createDataFrame([(1, "x1"), (2, "y1"), (3, "z1")], ["id", "k"])
    out = {r.id: r.maybe_seen for r in bloom_probe(probe, merged, "id", "k").collect()}
    assert out[1] and out[2] and not out[3]


def test_dsir_weights_separate_target_domain(spark):
    """DSIR sanity: documents IN the target domain (English) must
    average a strictly higher hashed-bigram likelihood-ratio weight
    than out-of-domain documents — the whole point of the score. Also
    pins that zero-bigram docs are absent and weights are finite."""
    import math

    from pyspark.sql import functions as F

    from dataframe_sql_spark.operators.relevance import dsir_weights
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "is_en", F.col("lang") == "en"
    )
    w = dsir_weights(docs, "doc_id", "text", "is_en").join(
        docs.select("doc_id", "is_en"), "doc_id"
    )
    rows = w.groupBy("is_en").agg(F.avg("weight").alias("m")).collect()
    m = {r.is_en: r.m for r in rows}
    assert m[True] > m[False], f"target mean {m[True]} <= raw mean {m[False]}"
    vals = [r.weight for r in w.select("weight").collect()]
    assert all(math.isfinite(v) for v in vals)
    # production (xxhash64) path builds and separates too
    w2 = dsir_weights(docs, "doc_id", "text", "is_en", feature_hash="xx").join(
        docs.select("doc_id", "is_en"), "doc_id"
    )
    m2 = {
        r.is_en: r.m
        for r in w2.groupBy("is_en").agg(F.avg("weight").alias("m")).collect()
    }
    assert m2[True] > m2[False]
