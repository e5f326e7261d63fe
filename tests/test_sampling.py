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
    assert "Exchange" not in plan  # no shuffle: pure scan+project
