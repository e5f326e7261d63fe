"""Data-layout operators: clustering data on disk so scans skip it.

At 100 TB the fastest query is the one that never reads most files:
parquet keeps min/max statistics per file and row group, and Spark
prunes both when the data is *clustered* so each file covers a narrow
value range. These operators produce that layout.

- ``write_clustered``: range-repartition + sort-within-partitions →
  each output file owns a disjoint slice of the cluster key. One
  shuffle at write time buys row-group skipping on every later scan.
- ``zorder_key``: bit-interleaved key over several columns, so sorting
  by ONE derived key gives locality in ALL of them — the standard
  multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER)
  expressed as a pure Spark column expression (codegen, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_clustered"]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one BIGINT morton key: bit i of column j lands at
    position ``i * ncols + j``.

    ``bits * len(cols)`` must stay ≤ 63. Columns should be rank- or
    range-encoded first if they aren't already small non-negative ints
    (the caller owns that normalization; keeping this a pure bit
    transform makes it deterministic and engine-portable).
    """
    ncols = len(cols)
    if bits * ncols > 63:
        raise ValueError(f"bits*ncols = {bits * ncols} exceeds 63")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = col.cast("long")
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * ncols + j)
    return key


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    zorder: bool = False,
    zorder_bits: int = 16,
) -> None:
    """Write parquet clustered on ``cluster_cols``.

    Default: range-repartition on the key columns (sampled range
    bounds → near-equal file sizes, no hot files) and sort within each
    partition, so every file and row group covers a disjoint key
    slice — later scans with a key predicate read ~1/num_files of the
    data. With ``zorder=True`` the cluster key is the interleaved
    morton key instead, trading perfect single-column locality for
    good locality on every listed column at once.
    """
    if zorder:
        keyed = df.withColumn("__zk", zorder_key(cluster_cols, zorder_bits))
        out = (
            keyed.repartitionByRange(num_files, "__zk")
            .sortWithinPartitions("__zk")
            .drop("__zk")
        )
    else:
        out = df.repartitionByRange(num_files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    out.write.mode("overwrite").parquet(path)


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    The small-files problem is the classic slow killer of streaming
    sinks and over-parallel writers: a 100 TB table written as 10 M
    tiny files spends more time opening footers than reading data.
    Compaction = read → repartition to ceil(bytes/target) →
    (optionally re-cluster) → atomic swap via a staging directory.

    Returns the number of output files. Uses filesystem size as the
    pre-compression estimate, so output files land under the target
    (parquet re-compression only shrinks them further).
    """
    import math
    import shutil
    from pathlib import Path

    src = Path(path)
    total = sum(f.stat().st_size for f in src.rglob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if cluster_by:
        out = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        out = df.repartition(n_files)
    staging = str(src.with_name(src.name + "__compacting"))
    out.write.mode("overwrite").parquet(staging)
    backup = src.with_name(src.name + "__precompact")
    src.rename(backup)
    Path(staging).rename(src)
    shutil.rmtree(backup)
    return len(list(src.glob("*.parquet")))
