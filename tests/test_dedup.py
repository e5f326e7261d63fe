

def test_incremental_dedup_against_index(spark, engine):
    # History: docs 1-2. New batch: 10 (dup of 1), 11 (dup of itself
    # and 12), 12, 13 (novel). Expect kept = {11 or 12 min-id -> 11, 13},
    # 10 dropped via the index, 12 dropped within-batch.
    import pandas as pd

    from dataframe_sql_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_index,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content about distributed query engines at scale"
    third = "a third topic entirely concerning maritime navigation and tides"
    hist = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [base, other]})
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12, 13],
                "text": [base + " ok", third, third + " yes", "unrelated short novel text here entirely"],
            }
        )
    )
    index = minhash_band_index(hist, "doc_id", "text")
    kept, delta = incremental_minhash_dedup(new, index, "doc_id", "text")
    kept_ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert 10 not in kept_ids  # caught by the historical index
    assert 11 in kept_ids and 12 not in kept_ids  # within-batch min-id survives
    assert 13 in kept_ids
    # delta covers exactly the kept ids
    assert sorted(
        r["doc_id"] for r in delta.select("doc_id").distinct().collect()
    ) == kept_ids


def test_substring_span_stats_planted_duplicates(spark):
    import pandas as pd

    from dataframe_sql_spark.operators.dedup import substring_span_stats

    boiler = "subscribe to our newsletter for updates every single day thanks"  # 10 words
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta " + boiler,
                "one two three four five six seven eight nine " + boiler,
                "totally unique words without any repeated gram content at all",
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in substring_span_stats(
            spark.createDataFrame(rows), "doc_id", "text", k=5
        ).collect()
    }
    # the 10-word boilerplate is shared: 6 duplicated 5-grams covering
    # its 10 tokens in docs 1 and 2
    assert out[1]["dup_grams"] == 6 and out[2]["dup_grams"] == 6
    assert out[1]["covered_tokens"] == 10 and out[2]["covered_tokens"] == 10
    assert abs(out[1]["dup_ratio"] - 10 / 18) < 1e-9
    # doc 3 shares nothing
    assert out[3]["dup_grams"] == 0 and out[3]["dup_ratio"] == 0.0
    # every doc gets a row
    assert set(out) == {1, 2, 3}


def test_decontamination_semi_join_shape(spark):
    """Planted case: a train doc embedding an exact benchmark 8-gram is
    dropped; paraphrases survive."""
    import pandas as pd

    from dataframe_sql_spark.operators.dedup import kgram_positions

    bench_text = "which ocean is the largest body of water on the planet earth"
    rows = pd.DataFrame(
        {
            "doc_id": [1, 100, 101],
            "text": [
                bench_text,
                "quiz answer: which ocean is the largest body of water on the planet earth today",
                "the biggest sea on earth is discussed in many geography classes",
            ],
        }
    )
    df = spark.createDataFrame(rows)
    bench_grams = (
        kgram_positions(df.filter("doc_id < 50"), "doc_id", "text", k=8)
        .select("gh")
        .distinct()
    )
    hit = (
        kgram_positions(df.filter("doc_id >= 50"), "doc_id", "text", k=8)
        .join(bench_grams, "gh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    assert [r.doc_id for r in hit.collect()] == [100]


def test_simhash_multiprobe_radius_complete(spark):
    """probe_bits=1 guarantee: EVERY pair within hamming <= 2*chunks-1
    surfaces as a candidate (pigeonhole + 1-bit probe), verified
    against brute-force hamming over all pairs."""
    from pyspark.sql import functions as F

    from dataframe_sql_spark.operators.dedup import (
        hashed_shingle_frame,
        simhash_bits,
        simhash_candidate_pairs,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(300)
    got = {
        (r.id_a, r.id_b)
        for r in simhash_candidate_pairs(
            docs, "doc_id", "text", max_hamming=7, probe_bits=1
        ).collect()
    }
    sig = (
        hashed_shingle_frame(docs, "doc_id", "text", 2)
        .withColumnRenamed("__h", "__th")
        .select("doc_id", simhash_bits("__th").alias("sim"))
    )
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sim").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sim").alias("sb"))
    want = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter("h <= 7")
        .collect()
    }
    assert want <= got or want == got  # completeness (no missed pair)
    assert got == want  # and no pair beyond the radius


def test_simhash_multiprobe_improves_recall_vs_default(spark):
    """The measured motivation: on the sf0.001 corpus the probed radius
    finds a superset of the default radius-3 candidates."""
    from dataframe_sql_spark.operators.dedup import simhash_candidate_pairs
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = {
        (r.id_a, r.id_b)
        for r in simhash_candidate_pairs(docs, "doc_id", "text").collect()
    }
    probed = {
        (r.id_a, r.id_b)
        for r in simhash_candidate_pairs(
            docs, "doc_id", "text", max_hamming=7, probe_bits=1
        ).collect()
    }
    assert base <= probed
    assert len(probed) > len(base)


def test_substring_span_remove_keep_one_policy(spark):
    import pandas as pd

    from dataframe_sql_spark.operators.dedup import substring_span_remove

    boiler = "subscribe to our newsletter for updates every single day thanks"  # 10 words
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta " + boiler,
                "one two three four five six seven eight nine " + boiler,
                "totally unique words without any repeated gram content at all",
                boiler,  # exact copy of the boilerplate only
            ],
        }
    )
    out = {
        r["doc_id"]: r
        for r in substring_span_remove(
            spark.createDataFrame(rows), "doc_id", "text", k=5
        ).collect()
    }
    # doc 1 holds the globally first occurrence of every boiler gram ->
    # keeps ALL its tokens (18); docs 2 and 4 lose the covered span
    assert out[1]["kept_tokens"] == 18 and boiler in out[1]["clean_text"]
    assert out[2]["kept_tokens"] == 9  # own prefix survives, boiler cut
    assert boiler not in out[2]["clean_text"]
    assert out[2]["clean_text"] == "one two three four five six seven eight nine"
    # doc 3 untouched; doc 4 fully covered -> empty but still a row
    assert out[3]["kept_tokens"] == 10
    assert out[4]["kept_tokens"] == 0 and out[4]["clean_text"] == ""


def test_vectorized_signatures_match_expressions(spark):
    """The Arrow-vectorized signature kernels (functions/npsig.py) must
    be BIT-EXACT vs the pure-expression formulations they replaced in
    the hot paths — for both the xxhash64 (64-bit) and md5 (60-bit)
    feature-hash spaces, including the short-doc/degenerate rows. This
    is what lets the oracle-replayed certificates keep hash-matching
    through the vectorized path."""
    from pyspark.sql import functions as F

    from dataframe_sql_spark.functions.npsig import (
        oph_signature_vec,
        simhash_bits_vec,
    )
    from dataframe_sql_spark.operators.dedup import (
        hashed_shingle_frame,
        md5_shingle_frame,
        oph_densify_rotation,
        oph_raw_lanes,
        simhash_bits,
    )
    from tests.conftest import SF_DIR

    # bounded doc set, and the expression/vectorized sides are collected
    # as SEPARATE plans (one combined compare plan makes the optimizer
    # chew on the interpreted signature trees for minutes)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(400)
    for hasher, value_bits in ((hashed_shingle_frame, 64), (md5_shingle_frame, 60)):
        h2 = hasher(docs, "doc_id", "text", 2).withColumnRenamed("__h", "__th")
        ref = {
            r.doc_id: r.s
            for r in h2.select(
                "doc_id", simhash_bits("__th").alias("s")
            ).collect()
        }
        vec = {
            r.doc_id: r.s
            for r in h2.select(
                "doc_id", simhash_bits_vec(F.col("__th")).alias("s")
            ).collect()
        }
        assert ref == vec, value_bits
        h3 = hasher(docs, "doc_id", "text", 3)
        oref = {
            r.doc_id: tuple(r.s)
            for r in h3.select(
                "doc_id",
                oph_raw_lanes(F.col("__h"), 64, value_bits).alias("__lanes"),
            )
            .select(
                "doc_id", oph_densify_rotation(F.col("__lanes"), 64).alias("s")
            )
            .collect()
        }
        ovec = {
            r.doc_id: tuple(r.s)
            for r in h3.select(
                "doc_id",
                oph_signature_vec(F.col("__h"), 64, value_bits).alias("s"),
            ).collect()
        }
        assert oref == ovec, value_bits
