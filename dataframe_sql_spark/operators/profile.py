"""Single-pass data profiling (the ANALYZE TABLE / data-quality
dashboard shape).

The reference has no profiling surface; every large-scale pipeline
needs one: null rates, distinct cardinalities, and value ranges per
column, computed in ONE scan regardless of column count (a
per-column-scan profiler reads a 100 TB table N times; this one reads
it once — all per-column aggregates ride in a single partial/final
HashAggregate, then a constant-width explode turns the 1-row result
into per-column rows).

Exact distinct counts are used here because the differential oracle
needs them; at real scale swap ``count_distinct`` for
``approx_count_distinct`` (or the HLL partials in
functions/sketches.py, which also make the profile incrementally
maintainable per ingest batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_frame"]


def profile_frame(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_null, n_distinct,
    min_val, max_val) with min/max rendered as strings so mixed-type
    frames profile uniformly.

    One scan, one 1-row aggregate, one explode. Numeric columns
    stringify via CAST, so cross-engine comparison is exact for
    integers/strings (floats would need care; the profiled id/text
    columns here are both).
    """
    names = cols or df.columns
    string_cols = {f.name for f in df.schema.fields if f.dataType.typeName() == "string"}
    aggs = []
    for c in names:
        col = F.col(c)
        # Distinct-count string columns through a null-preserving
        # xxhash64: Spark plans multi-column count_distinct as an
        # Expand + exchange KEYED ON the distinct arguments, so raw
        # text would ride the shuffle as a key — the 100-TB
        # shuffle-volume rule this repo lints against (the fixed-width
        # hash moves 8 bytes instead of the document; collision odds
        # ~n²/2⁶⁴, the same tolerance exact_dedup documents). The
        # isNotNull guard keeps count_distinct's ignore-NULLs
        # semantics (a bare xxhash64(NULL) would hash to the seed and
        # count as a value).
        dist_arg = (
            F.when(col.isNotNull(), F.xxhash64(col)) if c in string_cols else col
        )
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__null_{c}"),
            F.count_distinct(dist_arg).alias(f"__dist_{c}"),
            F.min(col.cast("string")).alias(f"__min_{c}"),
            F.max(col.cast("string")).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__rows_{c}").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in names
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
