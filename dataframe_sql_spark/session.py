"""SparkSession construction with scale-aware defaults.

Local testing runs on ``local[N]`` (single JVM), but every config here is
chosen so the same code is correct on a 1000-executor cluster reading
~100 TB:

- AQE on (runtime re-planning: partition coalescing, skew-join splitting,
  broadcast conversion after runtime stats).
- Shuffle partitions sized for the local core count via env override;
  on a real cluster AQE's coalescing makes the initial number forgiving.
- Arrow enabled so any ``toPandas``/Pandas-UDF boundary is vectorized.
- Session timezone pinned UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "tune_for_scale"]


def get_spark(app_name: str = "dataframe_sql_spark") -> SparkSession:
    """Return (building if needed) the tuned SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Broadcast threshold: dims like region/nation/supplier stay
        # broadcast even at 100 TB fact scale.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # Order-by-ordinal + case-insensitive resolution match the
        # reference dialect (SURVEY.md §1, §2.7 O5).
        .config("spark.sql.caseSensitive", "false")
        # events.parquet stores TIMESTAMP(NANOS); read as long and let
        # sources.io.read_table convert to microsecond timestamps
        # JVM-side (no driver materialization).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_scale(spark: SparkSession, target_bytes: int) -> None:
    """Adjust shuffle parallelism for a known input size.

    Rule of thumb: ~128 MB per shuffle partition post-filter. With AQE
    coalescing enabled the exact value is forgiving; this sets the upper
    bound so huge inputs don't funnel through too few partitions.
    """
    partitions = max(32, target_bytes // (128 * 1024 * 1024))
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
