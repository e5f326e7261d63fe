"""Mergeable cardinality sketches (Datasketches HLL, JVM-built-in).

The reference has no sketch surface (its aggregates are exact,
pandas_sql_functionality_test.py:229-257); this is the extension that
makes distinct-counting viable at 100 TB: exact COUNT(DISTINCT) over a
fact table shuffles every distinct value, every time someone asks —
a sketch is built ONCE per (group, segment) partial, persisted as a
few-KB binary column, and every later rollup is a cheap union of
partials instead of a rescan of the raw data.

Both steps are single shuffles on the grouping keys, with map-side
partial aggregation; sketches are fixed-size (≤ ~2^lgk bytes) so the
merge shuffle is bounded by group-count, not data volume.

All functions are built-in JVM aggregates (`hll_sketch_agg`,
`hll_union_agg` — Spark 3.5+) — no UDF, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_partials", "hll_rollup", "hll_estimate_exactish"]


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    segment_col: str,
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Per (group, segment) HLL sketch of ``value_col`` — the
    persistable pre-aggregate.

    ``segment_col`` is the re-aggregation grain (typically a day or an
    ingest batch id): write this frame out partitioned by segment and
    later rollups never touch the raw events again. ``lgk=14`` →
    ~0.8 % relative standard error, ≤ 16 KB per sketch.
    """
    return df.groupBy(*group_cols, segment_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll")
    )


def hll_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union per-segment sketches up to ``group_cols`` and estimate.

    The input is the (small, bounded) partials frame — the merge
    shuffles sketch bytes keyed on the group columns, never raw
    values. Adding a day to a 3-year daily rollup costs one sketch,
    not a 3-year rescan.
    """
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("distinct_est")
    )


def hll_estimate_exactish(
    df: DataFrame,
    group_cols: list[str],
    segment_col: str,
    value_col: str,
    lgk: int = 14,
    rel_tol: float = 0.03,
) -> DataFrame:
    """Per-group sketch estimate alongside its exact check.

    Returns (group_cols..., exact_distinct, distinct_est, within_tol)
    where ``within_tol`` certifies |est − exact| ≤ rel_tol·exact.
    Exists so the sketch path can sit behind a *deterministic*
    differential oracle: the boolean (and the exact count) are
    engine-comparable even though the estimate itself is
    implementation-defined — registered oracles should compare only
    (group_cols, exact_distinct, within_tol) and drop the estimate.
    """
    est = hll_rollup(
        hll_partials(df, group_cols, segment_col, value_col, lgk), group_cols
    )
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(value_col).alias("exact_distinct")
    )
    return est.join(exact, on=group_cols).select(
        *group_cols,
        "exact_distinct",
        "distinct_est",
        (
            F.abs(F.col("distinct_est") - F.col("exact_distinct"))
            <= F.col("exact_distinct") * F.lit(rel_tol)
        ).alias("within_tol"),
    )
