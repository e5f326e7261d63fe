"""Broadcast scalar attachment without nested-loop joins.

The pattern "compute a 1-row global aggregate (corpus size, total
token count, dangling PageRank mass) and attach it to every row"
was written throughout this package as ``df.crossJoin(F.broadcast(
one_row))`` — semantically right and cheap (one broadcast row), but
Spark plans any non-equi cross join as BroadcastNestedLoopJoin, which
is indistinguishable in a plan lint from an accidental all-pairs
join. :func:`broadcast_attach` expresses the same attachment as an
equi-join on a constant key, which Catalyst plans as a
BroadcastHashJoin — same cost (the "hash table" is one entry; the
stream side probes a constant), but now ``BroadcastNestedLoopJoin``
in a catalog plan means an *actual* cartesian product and the lint
(tests/test_catalog_plan_lint.py) can ban it outright instead of
whitelisting ten benign scalar attachments.

Also correct for a small-but-multi-row side (e.g. a quantile list):
the constant key makes every (row, small-row) pair, i.e. exactly the
cross product, still hash-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["broadcast_attach"]

_KEY = "__attach_key"


def broadcast_attach(df: DataFrame, small: DataFrame) -> DataFrame:
    """Cross-attach a broadcast-small frame (typically one aggregate
    row) to every row of ``df`` via a constant-key BroadcastHashJoin.

    Equivalent to ``df.crossJoin(F.broadcast(small))`` whenever
    ``small`` is guaranteed non-empty (a global aggregate always
    yields exactly one row); keeps the plan BNLJ-free.

    The key must be constant-valued yet NOT constant-foldable — a
    bare ``lit(1)`` folds and Catalyst degrades the join back to a
    nested loop. ``pmod(hash(col), 1)`` is always 0, never null (hash
    of null is the seed), and references a real attribute, so it
    survives optimization as an equi-key. The column hashed is the
    first ATOMIC-typed one (``hash()`` is an analysis error on
    MapType, and hashing a wide struct/array column does pointless
    per-row work); a frame with no atomic column hashes
    ``to_json(struct(first_col))`` instead.
    """

    _ATOMIC = (
        T.NumericType,
        T.StringType,
        T.BooleanType,
        T.DateType,
        T.TimestampType,
        T.TimestampNTZType,
        T.BinaryType,
    )

    def _key(frame: DataFrame) -> F.Column:
        for fld in frame.schema.fields:
            if isinstance(fld.dataType, _ATOMIC):
                return F.pmod(F.hash(frame[fld.name]), F.lit(1)).cast("int")
        c = frame.columns[0]
        return F.pmod(
            F.hash(F.to_json(F.struct(frame[c]))), F.lit(1)
        ).cast("int")

    return (
        df.withColumn(_KEY, _key(df))
        .join(F.broadcast(small.withColumn(_KEY, _key(small))), _KEY)
        .drop(_KEY)
    )
