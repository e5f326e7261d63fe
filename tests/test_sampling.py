"""Deterministic sampling/split operators: reproducibility,
partitioning-independence, disjointness — properties the row-hash
driver check can't see."""

from __future__ import annotations

from dataframe_sql_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_hash_sample,
)


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


def test_hash_split_partitions_rows(engine):
    docs = engine.spark.table("documents")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    total = docs.count()
    assert sum(counts.values()) == total  # exhaustive, disjoint by construction
    assert 0.7 < counts["train"] / total < 0.9  # roughly proportional
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_hash_sample_deterministic_and_partition_independent(engine):
    docs = engine.spark.table("documents")
    a = _ids(hash_sample(docs, "doc_id", 0.3))
    b = _ids(hash_sample(docs.repartition(7), "doc_id", 0.3))
    assert a == b and 0 < len(a) < docs.count()
    # different seed → different sample
    c = _ids(hash_sample(docs, "doc_id", 0.3, seed=7))
    assert c != a


def test_hex_threshold_boundaries():
    from dataframe_sql_spark.operators.sampling import hex_threshold

    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.5) == "80000000"
    # fraction 1.0 must exceed every hex bucket, including "ffffffff"
    assert hex_threshold(1.0) > "ffffffff"
    assert hex_threshold(2.0) > "ffffffff"


def test_stratified_fractions_respected(engine):
    docs = engine.spark.table("documents")
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"de": 1.0}, default_fraction=0.0
    )
    # fraction 1.0 keeps every row of the stratum, 0.0 drops all others
    assert out.count() == docs.filter("lang = 'de'").count()
    assert out.filter("lang != 'de'").count() == 0


def test_pack_sequences_semantics(spark):
    from dataframe_sql_spark.operators.packing import pack_sequences

    rows = [(i, "g", t) for i, t in enumerate([100, 100, 100, 100, 150, 600, 50])]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n"])
    out = {
        r.doc_id: (r.bin, r.bin_offset)
        for r in pack_sequences(df, "grp", "doc_id", "n", capacity=256).collect()
    }
    # cum_before: 0,100,200,300,400,550,1150 → bins 0,0,0,1,1,2,4
    assert out == {
        0: (0, 0),
        1: (0, 100),
        2: (0, 200),   # straddles the 256 boundary, stays in bin 0
        3: (1, 44),
        4: (1, 144),
        5: (2, 38),    # 600-token doc overflows bins 2-4
        6: (4, 126),
    }


def test_split_is_map_side_only(engine):
    plan = hash_split(
        engine.spark.table("documents"), "doc_id", {"a": 0.5, "b": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    # no KEYED shuffle: the split itself is pure scan+project. The r14
    # adaptive scan fan-out may insert one round-robin repartition of
    # the raw scan (no-op at scale) — deliberately permitted.
    assert "hashpartitioning" not in plan  # no shuffle from the split
    assert "SinglePartition" not in plan


def test_dataset_mix_hits_target_proportions(engine):
    from dataframe_sql_spark.operators.sampling import dataset_mix

    docs = engine.spark.table("documents")
    weights = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    out = dataset_mix(docs, "doc_id", "lang", weights, seed=42)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    total = sum(counts.values())
    assert total > 0
    # Hash granularity + small-N noise: proportions within 6 points.
    for lang, w in weights.items():
        assert abs(counts.get(lang, 0) / total - w) < 0.06, (lang, counts, total)
    # The binding source (max count/weight ratio deficit) is kept whole.
    src_counts = {
        r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    t = min(src_counts[s] / w for s, w in weights.items())
    binding = min(weights, key=lambda s: src_counts[s] / weights[s])
    assert counts[binding] == src_counts[binding]


def test_dataset_mix_guards(engine):
    import pytest as _pytest

    from dataframe_sql_spark.operators.sampling import dataset_mix

    docs = engine.spark.table("documents")
    with _pytest.raises(ValueError, match="cardinality"):
        dataset_mix(docs, "doc_id", "doc_id", {"1": 1.0}, max_sources=3)
    with _pytest.raises(ValueError, match="no target_weights"):
        dataset_mix(docs, "doc_id", "lang", {"xx": 1.0})


def test_global_shuffle_matches_naive_rank(engine):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataframe_sql_spark.operators.sampling import global_shuffle

    docs = engine.spark.table("documents").select("doc_id")
    out = global_shuffle(docs, "doc_id", seed=7)
    got = {r.doc_id: r.shuffle_pos for r in out.collect()}
    # naive single-sort formulation for comparison
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":7")))
    naive = docs.withColumn(
        "pos", F.row_number().over(Window.orderBy(h, F.col("doc_id")))
    )
    want = {r.doc_id: r.pos for r in naive.collect()}
    assert got == want
    # dense permutation 1..N
    assert sorted(got.values()) == list(range(1, len(got) + 1))


def test_negative_pairs_deterministic_and_bounded(spark):
    from dataframe_sql_spark.operators.sampling import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(40)], ["rid"])
    a = {(r.rid, r.j, r.neg_id) for r in negative_pairs(df, "rid", k=3).collect()}
    b = {(r.rid, r.j, r.neg_id) for r in negative_pairs(df, "rid", k=3).collect()}
    assert a == b and len(a) > 0  # hash-deterministic across runs
    assert all(1 <= j <= 3 for _, j, _ in a)
    assert all(rid != neg for rid, _, neg in a)  # self-draws dropped
    assert all(0 <= neg < 40 for _, _, neg in a)  # draws land in the corpus
    # each row draws at most k, and most draws survive the self-filter
    assert len(a) >= 40 * 3 * 0.9
