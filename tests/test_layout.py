"""Data-layout operators: verify clustered writes actually produce
disjoint per-file key ranges (the property that makes min/max file
skipping work), using the parquet footer statistics themselves."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from dataframe_sql_spark.operators.layout import write_clustered, zorder_key


def _file_ranges(path: str, col: str) -> list[tuple]:
    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((lo, hi))
    return sorted(out)


def test_clustered_write_gives_disjoint_file_ranges(engine, tmp_path):
    path = str(tmp_path / "orders_clustered")
    write_clustered(
        engine.spark.table("orders"), path, ["o_totalprice"], num_files=8
    )
    ranges = _file_ranges(path, "o_totalprice")
    assert len(ranges) > 1
    # every file owns a disjoint slice: file i's max ≤ file i+1's min
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, ranges


def test_clustered_scan_prunes_row_groups(engine, tmp_path):
    path = str(tmp_path / "li_clustered")
    write_clustered(
        engine.spark.table("lineitem"), path, ["l_orderkey"], num_files=8
    )
    spark = engine.spark
    total = spark.read.parquet(path).count()
    narrow = spark.read.parquet(path).filter("l_orderkey < 100").count()
    reference = engine.spark.table("lineitem").filter("l_orderkey < 100").count()
    assert narrow == reference and 0 < narrow < total


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], ["x", "y"])
    out = {
        (r.x, r.y): r.zk
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=2).alias("zk")).collect()
    }
    # morton order: x bits at even positions, y bits at odd
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(3, 3)] == 15


def test_zorder_write_clusters_both_columns(spark, tmp_path):
    # equal-bit-width columns (z-order's precondition — rank/range
    # encode first in real pipelines): a 64×64 grid, both dims 6 bits
    path = str(tmp_path / "grid_z")
    grid = spark.range(64 * 64).selectExpr("id % 64 AS x", "id div 64 AS y")
    write_clustered(grid, path, ["x", "y"], num_files=16, zorder=True, zorder_bits=6)
    assert spark.read.parquet(path).count() == 64 * 64
    # locality: each file's span in BOTH dimensions is much narrower
    # than the global 0..63 span (a plain sort on x would leave y
    # spans at the full 63)
    for col in ("x", "y"):
        ranges = _file_ranges(path, col)
        avg_span = sum(hi - lo for lo, hi in ranges) / len(ranges)
        assert avg_span < 63 * 0.6, (col, ranges)


def test_compact_small_files_preserves_rows(spark, tmp_path):
    from dataframe_sql_spark.operators.layout import compact_small_files

    path = str(tmp_path / "frag")
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # simulate a fragmented streaming sink: 64 tiny files
    src.repartition(64).write.parquet(path)
    import pathlib

    assert len(list(pathlib.Path(path).glob("*.parquet"))) >= 64
    before = src.count()
    n_files = compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert n_files == 1  # everything fits one target-sized file
    after = spark.read.parquet(path)
    assert after.count() == before
    # no column lost, values intact on a sample aggregate
    assert after.groupBy().sum("l_quantity").collect() == src.groupBy().sum(
        "l_quantity"
    ).collect()


def test_observe_metrics_single_pass(spark):
    """df.observe(): pipeline data-quality metrics (row count, null
    count, mean) accumulated DURING the normal action — no second scan.
    At 100 TB a separate metrics pass doubles the read bill."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    obs = Observation("quality")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.avg("l_quantity").alias("avg_qty"),
    )
    out = observed.filter("l_quantity > 25").count()  # the real work
    m = obs.get
    assert m["n_rows"] == df.count() and m["null_qty"] == 0
    assert 20 < m["avg_qty"] < 30 and out > 0
