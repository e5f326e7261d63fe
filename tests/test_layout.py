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
