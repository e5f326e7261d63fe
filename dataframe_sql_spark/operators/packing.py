"""Sequence packing: assign documents to fixed-token-budget bins —
the step that turns a curated corpus into training batches.

Packing here is *contiguous fill*: within each group, documents are
taken in a deterministic order and a new bin starts whenever the
running token total would cross the capacity. That definition is

- expressible as one window cumsum (pure built-ins, one shuffle on
  the group key — no Python, no per-bin state), and
- deterministic given (group, order), so the same corpus packs the
  same way on any cluster, any partitioning, any engine (the DuckDB
  oracle runs the identical window algebra).

First-fit-decreasing packs ~tighter but needs per-bin state (an
applyInPandas per group); contiguous fill is the scalable default —
at 100 TB the group key is (shard, lang) so each window stays
executor-sized.

Documents longer than ``capacity`` get a bin of their own (the
running total resets past them); splitting long docs is a separate
upstream chunking concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    capacity: int,
    bin_col: str = "bin",
    offset_col: str = "bin_offset",
) -> DataFrame:
    """Assign each row a ``bin`` (0-based, per group) and its token
    ``bin_offset`` inside that bin, by contiguous fill in
    ``order_col`` order: bin = floor(cumulative_tokens_before /
    capacity), offset = cumulative_tokens_before % capacity.

    A row that straddles a capacity boundary stays in the bin where
    it started (bins may overflow by at most one document — the
    streaming-friendly convention; callers wanting hard caps truncate
    or pre-chunk long docs). This is the window-expressible packing:
    exact greedy "reset when full" needs sequential state per group.

    ``order_col`` must be unique within each group (e.g. a doc id) —
    ties would make the cumsum, and therefore bin assignment,
    nondeterministic.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(bin_col, F.floor(cum_before / capacity).cast("int")).withColumn(
        offset_col, (cum_before % capacity).cast("bigint")
    )
