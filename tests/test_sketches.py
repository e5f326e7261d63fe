"""Gates for the mergeable HLL sketch surface (functions/sketches.py):
estimate accuracy vs exact, and the mergeability property the 100 TB
design depends on — union of per-segment partials must agree with a
single direct sketch over the whole data."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataframe_sql_spark.functions.sketches import (
    hll_estimate_exactish,
    hll_partials,
    hll_rollup,
)


def _synth(spark, n_groups=4, n_ids=2000, n_days=7):
    return (
        spark.range(n_groups * n_ids * n_days)
        .select(
            (F.col("id") % n_groups).cast("string").alias("grp"),
            ((F.col("id") % (n_ids * 7)) / 7).cast("long").alias("uid"),  # overlapping ids
            (F.col("id") % n_days).alias("day"),
        )
    )


def test_hll_estimate_within_tolerance(spark):
    df = _synth(spark)
    out = hll_estimate_exactish(df, ["grp"], "day", "uid", lgk=14, rel_tol=0.03)
    rows = out.collect()
    assert len(rows) == 4
    assert all(r.within_tol for r in rows)


def test_hll_partials_merge_matches_direct(spark):
    """Rollup of daily partials == direct sketch of all rows (same lgk)
    — the invariant that lets partials be persisted and re-aggregated
    without rescanning raw data."""
    df = _synth(spark)
    merged = hll_rollup(hll_partials(df, ["grp"], "day", "uid", lgk=12), ["grp"])
    direct = df.groupBy("grp").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12))).alias("direct_est")
    )
    joined = merged.join(direct, "grp").collect()
    for r in joined:
        assert abs(r.distinct_est - r.direct_est) <= max(1, 0.01 * r.direct_est), r


def test_hll_partials_are_bounded_binary(spark):
    """Partial sketches are fixed-size binary payloads (not value
    lists): the merge shuffle is O(groups·segments·sketch_size)."""
    df = _synth(spark)
    p = hll_partials(df, ["grp"], "day", "uid", lgk=12)
    assert dict(p.dtypes)["hll"] == "binary"
    sizes = p.select(F.max(F.length("hll")).alias("m")).collect()[0].m
    assert sizes <= (1 << 12) * 8  # well under lgk bound


def test_hist_quantile_rollup_accuracy_and_merge(spark):
    from pyspark.sql import functions as F

    from dataframe_sql_spark.functions.sketches import (
        hist_partials,
        hist_quantile_rollup,
    )

    df = spark.range(0, 1000).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") % 5).alias("seg"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    parts = hist_partials(df, ["g"], "seg", "v", 0.0, 100.0, bins=100)
    est = {
        (r.g, r.q): r.est_q
        for r in hist_quantile_rollup(
            parts, ["g"], [0.5, 0.9], 0.0, 100.0, bins=100
        ).collect()
    }
    # v uniform over 0..99 in each group: p50 ~ 49.x, p90 ~ 89.x;
    # estimate error bounded by one bin (width 1)
    for g in (0, 1):
        assert abs(est[(g, 0.5)] - 50.0) <= 1.0
        assert abs(est[(g, 0.9)] - 90.0) <= 1.0
    # merging partials segment-by-segment == building over the union
    half_a = hist_partials(
        df.filter("seg < 2"), ["g"], "seg", "v", 0.0, 100.0, bins=100
    )
    half_b = hist_partials(
        df.filter("seg >= 2"), ["g"], "seg", "v", 0.0, 100.0, bins=100
    )
    merged = {
        (r.g, r.q): r.est_q
        for r in hist_quantile_rollup(
            half_a.union(half_b), ["g"], [0.5, 0.9], 0.0, 100.0, bins=100
        ).collect()
    }
    assert merged == est


def test_hist_partials_clamp_out_of_range(spark):
    from dataframe_sql_spark.functions.sketches import hist_partials

    df = spark.createDataFrame(
        [(1, "s", -5.0), (1, "s", 500.0), (1, "s", 50.0)], ["g", "seg", "v"]
    )
    rows = {r.bin: r.n for r in hist_partials(df, ["g"], "seg", "v", 0.0, 100.0, bins=10).collect()}
    assert rows[0] == 1 and rows[9] == 1 and rows[5] == 1


def test_cms_no_underestimate_and_merge_equivalence(spark):
    from pyspark.sql import functions as F

    from dataframe_sql_spark.functions.sketches import (
        cms_estimate,
        cms_merge,
        cms_partials,
    )

    # skewed stream: key0 x 500, key1 x 100, 400 distinct rare keys
    rows = (
        [("a", "key0")] * 300
        + [("b", "key0")] * 200
        + [("a", "key1")] * 100
        + [("b", f"rare{i}") for i in range(400)]
    )
    df = spark.createDataFrame(rows, ["seg", "k"])
    counters = cms_merge(cms_partials(df, "seg", "k", depth=4, width=256))
    keys = spark.createDataFrame(
        [("key0",), ("key1",), ("rare7",), ("unseen",)], ["k"]
    )
    est = {r.k: r.cms_est for r in cms_estimate(keys, counters, "k", 4, 256).collect()}
    exact = {"key0": 500, "key1": 100, "rare7": 1, "unseen": 0}
    for k, n in exact.items():
        assert est[k] >= n  # never underestimates
    # heavy hitters stay sharp: collisions add at most the rare tail
    assert est["key0"] <= 500 + 400
    assert est["key0"] >= 2 * est["rare7"]
    # building per-segment then merging == building unsegmented
    one_seg = cms_merge(
        cms_partials(df.withColumn("seg", F.lit("x")), "seg", "k", 4, 256)
    )
    a = {(r.d, r.idx): r.n for r in counters.collect()}
    b = {(r.d, r.idx): r.n for r in one_seg.collect()}
    assert a == b
