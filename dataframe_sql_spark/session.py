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

__all__ = ["get_spark", "tune_session", "tune_for_scale"]

# Runtime-settable confs the engine depends on for CORRECTNESS (not just
# speed) on *any* session, including one built elsewhere and passed in
# (the driver's contract: entry(spark) / queries()[name](spark, sf_dir)).
# Every key here is settable via spark.conf.set after session start —
# verified against pyspark 4.1 (none is marked static/spark.core).
_RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS); without this the parquet
    # reader throws PARQUET_TYPE_ILLEGAL at registration. read_table
    # converts the resulting long to a microsecond timestamp JVM-side.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Timestamp semantics must match the DuckDB oracle (UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # Reference dialect is case-insensitive (SURVEY.md §1).
    "spark.sql.caseSensitive": "false",
    # Arrow for any toPandas/Pandas-UDF boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime coalescing / skew splitting / broadcast conversion.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst stays at its default (true): measured A/B at
    # sf0.1 — false shaves ~50 ms off shuffle-light queries but
    # serializes CPU-bound post-shuffle stages (window sort 0.52 s →
    # 0.87 s when the exchange coalesces to one advisory-size task).
    # Post-filter small shuffles feeding heavy compute exist at any
    # data scale, so parallelism wins the tie.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dims like region/nation/supplier stay broadcast at fact scale.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Honest scan-size estimates: compressed parquet decodes to ~3-10×
    # its file bytes in memory, and the default factor of 1.0 let a
    # column-pruned FACT scan slip under the broadcast threshold
    # (r12 sf1 A/B: Catalyst broadcast 6M-row lineitem — ~2× wall at
    # sf1, OOM-class at 100 TB). See the builder comment in get_spark.
    "spark.sql.sources.fileCompressionFactor": "3.0",
    # Shuffled hash join over sort-merge when a side's honest estimate
    # fits a per-partition hash map (canBuildLocalHashMap: size <
    # broadcast threshold × shuffle partitions, so the per-partition
    # build stays ~64 MB at ANY cluster width — the bound scales with
    # partition count). Skips both sort passes: measured 10-20% on
    # every sf1 join shape (q_join_multi 2.52→1.94 s, tpch_q21
    # 2.38→1.91 s; SCALE.md r12). Corpus-array joins whose width the
    # estimator can't see keep their explicit merge hints — hints
    # outrank this preference, so the no-broadcast pins are unaffected.
    # AQE skew splitting covers SHJ (Spark 3.2+), and sizes are honest
    # post-fileCompressionFactor, so the no-spill build side is bounded.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Belt-and-braces runtime form: even when static estimates are too
    # big, AQE converts SMJ→SHJ from OBSERVED per-partition shuffle
    # bytes when every partition fits the local map (≥ advisory size,
    # 64MB, so coalescing doesn't disarm it).
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64MB",
}


def tune_session(spark: SparkSession) -> None:
    """Apply the engine's required runtime-settable confs to an
    externally-built session (idempotent, best-effort per key).

    This is the guard against the works-locally/dies-in-driver class of
    bug: get_spark() bakes these into the builder, but a session handed
    to entry()/engine_for() has whatever confs its owner chose.
    """
    for key, value in _RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != value:
                spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf missing in a future Spark
            pass
    # Local-mode sessions default to 200 shuffle partitions — a 6×
    # slowdown on a 32-core box. Match the core count; real clusters
    # are handled by tune_for_scale/AQE coalescing instead.
    try:
        if spark.conf.get("spark.master", "").startswith("local"):
            cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
            spark.conf.set("spark.sql.shuffle.partitions", cpus)
    except Exception:  # pragma: no cover
        pass


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
        # Honest scan-size estimates (r12 sf1 A/B catch): Spark's
        # file-size-based sizeInBytes treats compressed+encoded
        # parquet bytes as in-memory bytes, so a column-pruned FACT
        # scan (6M-row lineitem, 3 cols) estimated under the 64MB
        # threshold and Catalyst BROADCAST THE FACT TABLE — ~2× wall
        # on every multi-join shape at sf1 (q_join_multi 3.98→1.97 s,
        # tpch_q5 4.00→1.97 s) and an OOM-class plan at 100 TB. 3×
        # is the conservative end of parquet's measured 3-10×
        # decode expansion; with honest sizes the static planner
        # keeps big sides on SMJ and AQE still builds the genuinely
        # small side from REAL post-shuffle bytes at runtime —
        # size-based decisions stay correct at every scale instead
        # of only below the estimate error.
        .config("spark.sql.sources.fileCompressionFactor", "3.0")
        # Hash join without the sort passes wherever a side's honest
        # estimate fits a per-partition build (measured 10-20% on sf1
        # join shapes, SCALE.md r12); merge hints on width-blind
        # corpus joins outrank this. AQE's runtime SMJ→SHJ conversion
        # from observed partition bytes backs up the static choice.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
        # Order-by-ordinal + case-insensitive resolution match the
        # reference dialect (SURVEY.md §1, §2.7 O5).
        .config("spark.sql.caseSensitive", "false")
        # events.parquet stores TIMESTAMP(NANOS); read as long and let
        # sources.io.read_table convert to microsecond timestamps
        # JVM-side (no driver materialization).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The lineage-truncation operators (operators/lineage.py) eagerly
        # localCheckpoint intermediate frames; their blocks are freed by
        # the ContextCleaner only after a JVM GC collects the RDD object
        # behind its weak reference. The default periodic-GC safety net
        # (30 min) lets a session that builds many short-lived
        # checkpointed frames (repeated queries, the bench, any
        # long-running service) accumulate gigabytes of dead storage
        # blocks: measured at sf0.1, bench keys running LATE in one
        # session degraded 3-10x (sim_ann_ivfpq_build 1.5 -> 14.7 s)
        # purely from this buildup. One forced GC a minute bounds the
        # dead-block window at negligible cost; the same hygiene is the
        # standard recommendation for iterative/streaming apps at any
        # cluster size. Builder-time only: ContextCleaner reads it at
        # SparkContext start, so tune_session cannot retrofit it onto a
        # foreign session. Env-overridable so the interval can be
        # A/B-isolated (r15) and tuned per deployment without a code
        # edit; the default stays the measured local/bench value.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "1min"),
        )
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
