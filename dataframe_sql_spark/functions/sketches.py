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

__all__ = [
    "hll_partials",
    "hll_rollup",
    "hll_estimate_exactish",
    "hll_intersect_estimate",
    "bloom_positions",
    "bloom_build",
    "bloom_probe",
    "hist_partials",
    "hist_quantile_rollup",
    "cms_partials",
    "cms_merge",
    "cms_estimate",
]


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


def hll_intersect_estimate(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Estimate |A ∩ B| from two HLL sketches by inclusion-exclusion:
    ``est(A) + est(B) − est(A ∪ B)``, where the union estimate comes
    from MERGING the two sketches (``hll_union``) — no second scan of
    either input, the sketch-algebra capability that makes cross-
    source overlap questions (shared vocabulary, common users, URL
    overlap between crawls) answerable from persisted per-source
    sketches alone at 100 TB.

    Returns one row (est_a, est_b, est_union, est_intersect). Error:
    each estimate carries ~1.04/√2^lgk relative error and inclusion-
    exclusion ADDS absolute errors, so the intersection estimate is
    only trustworthy when the overlap is a sizable fraction of the
    union — certify with a tolerance oracle (a_hll_intersect_cert).
    """
    from ..operators.scalars import broadcast_attach

    sa = a.agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("__ha"))
    sb = b.agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("__hb"))
    both = broadcast_attach(sa, sb)
    return both.select(
        F.hll_sketch_estimate("__ha").alias("est_a"),
        F.hll_sketch_estimate("__hb").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("__ha", "__hb")).alias("est_union"),
        (
            F.hll_sketch_estimate("__ha")
            + F.hll_sketch_estimate("__hb")
            - F.hll_sketch_estimate(F.hll_union("__ha", "__hb"))
        ).alias("est_intersect"),
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


# --------------------------------------------------------------------------
# Bloom filter as a bit-position table (the distributed form)
# --------------------------------------------------------------------------
#
# A packed bit array is the single-machine Bloom shape; the idiomatic
# Spark shape is its sparse dual — a table of distinct SET bit
# positions. It is mergeable (union = distinct concat), bounded
# (≤ min(m, k·n) rows of one BIGINT), joinable on a fixed 8-byte key,
# and probe-able with a semi-join instead of a per-row UDF. A packed
# broadcast variant is derivable (groupBy(pos div 64) + bit_or) when
# the filter must ride inside a map-side expression; the table form
# below is what you persist and co-partition at 100 TB.


def bloom_positions(key, k: int = 5, m_bits: int = 1 << 20):
    """array<bigint> of the ``k`` bit positions for ``key``.

    Position i = ``pmod(xxhash64(key, i), m_bits)`` — seeded 64-bit
    hashes, JVM-side, no UDF.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(F.xxhash64(key, i), F.lit(m_bits)),
    )


def bloom_build(
    df: DataFrame, key_col: str, k: int = 5, m_bits: int = 1 << 20
) -> DataFrame:
    """Build the bit-position table for every ``key_col`` value.

    Output: single ``pos`` BIGINT column, distinct. One shuffle (the
    distinct) on an 8-byte key; at scale, write it bucketed by ``pos``
    so later probes are shuffle-free on the build side.
    """
    return (
        df.select(
            F.explode(bloom_positions(F.col(key_col), k, m_bits)).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    bits: DataFrame,
    id_col: str,
    key_col: str,
    k: int = 5,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Probe keys against a built position table.

    Returns (id, maybe_seen) where ``maybe_seen`` is true iff ALL of
    the key's (distinct) positions are present in ``bits`` — the
    standard Bloom semantics: false positives possible, false
    negatives impossible.

    Plan: explode probe positions (map-side), left join the bit table
    on ``pos`` (broadcast when the filter is small, shuffle-on-8-byte
    key otherwise), count matched vs needed per id — one doc-id
    shuffle. No driver round-trip, unlike ``df.stat.bloomFilter``.
    """
    probe = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(bloom_positions(F.col(key_col), k, m_bits))
        ).alias("pos"),
    )
    hit = probe.join(
        bits.withColumn("__set", F.lit(True)), "pos", "left"
    )
    return hit.groupBy(id_col).agg(
        (F.count("*") == F.count(F.col("__set"))).alias("maybe_seen")
    )


# --------------------------------------------------------------------------
# fixed-range histogram partials → mergeable quantile estimates
# --------------------------------------------------------------------------
#
# The quantile analog of the HLL rollup above: exact percentiles at
# 100 TB cost a sort-per-group EVERY time someone asks; histogram
# partials are built once per (group, segment), persisted as a few
# hundred (bin, count) rows, and every later quantile query is a merge
# + cumulative scan over bin counts — no rescan, no sort. Unlike
# t-digest/KLL the estimate path is pure integer/double arithmetic on
# fixed bin edges, so a SQL oracle replays it EXACTLY (the HLL
# certificate can only bound its error; this one hash-matches).


def hist_partials(
    df: DataFrame,
    group_cols: list[str],
    segment_col: str,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Per (group, segment) fixed-range histogram: (…, bin, n).

    Values outside [lo, hi) clamp into the edge bins (documented
    semantics — the estimate degrades gracefully instead of erroring
    when a late segment exceeds the planned range). One shuffle with
    map-side partial aggregation; output size is bounded by
    groups × segments × bins, independent of row count.
    """
    width = (hi - lo) / bins
    idx = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
        ),
    ).cast("int")
    return df.groupBy(*group_cols, segment_col, idx.alias("bin")).agg(
        F.count("*").cast("bigint").alias("n")
    )


def hist_quantile_rollup(
    partials: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Merge partials across segments and estimate quantiles.

    For each q, the estimate is the RIGHT EDGE of the first bin whose
    cumulative count reaches ``q·total`` — deterministic integer
    arithmetic on merged counts, error ≤ one bin width by
    construction. Returns (group_cols…, q, est_q).

    The merge shuffles (group, bin) count rows only; the cumulative
    window runs over ≤ ``bins`` rows per group.
    """
    from pyspark.sql import Window

    width = (hi - lo) / bins
    merged = partials.groupBy(*group_cols, "bin").agg(F.sum("n").alias("n"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = merged.select(
        *group_cols,
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_tot).alias("tot"),
    )
    from ..operators.scalars import broadcast_attach

    qdf = broadcast_attach(
        cum, cum.sparkSession.createDataFrame([(q,) for q in qs], ["q"])
    )
    hit = (
        qdf.filter(F.col("cum") >= F.col("q") * F.col("tot"))
        .groupBy(*group_cols, "q")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        *group_cols,
        "q",
        F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 4).alias("est_q"),
    )


# --------------------------------------------------------------------------
# Count-Min sketch: mergeable heavy-hitter / frequency partials
# --------------------------------------------------------------------------
#
# Completes the mergeable-sketch triad: HLL (distinct counts),
# histogram (quantiles), CMS (per-key frequencies). Counters are
# (depth, idx, n) rows — persisted per segment, merged by summing,
# probed without touching raw data. The hash is the repo's
# cross-engine md5 convention (sampling.py uses the same trick), so a
# SQL oracle replays estimates EXACTLY, and the no-underestimate
# property (est >= true count, always, by construction) is certifiable.


def _cms_bucket(key, j, width: int):
    """Row index for hash function ``j``: first 8 md5 hex chars of
    ``key:j`` as an int, mod width — engine-portable (DuckDB:
    ``('0x' || substr(md5(key || ':' || j), 1, 8))::BIGINT % width``)."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(key, F.lit(":"), j.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def cms_partials(
    df: DataFrame,
    segment_col: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-segment CMS counters: (segment, d, idx, n).

    One corpus shuffle onto (segment, d, idx) — at most
    segments × depth × width distinct keys, with map-side partial
    aggregation. Output is the persistable pre-aggregate; row count is
    bounded by the counter grid, independent of input size.

    ``weight_col`` is the standard weighted-update form: each input row
    adds ``weight_col`` (instead of 1) to its ``depth`` cells. Feeding
    pre-aggregated (segment, key, count) rows through it yields counters
    IDENTICAL to streaming the raw occurrences, while hashing each
    distinct key once instead of once per occurrence — the md5 bucket
    hash was ~85% of the raw-stream build cost at sf0.1
    (OPTIMIZATION_r14.md).
    """
    n_expr = (
        F.count("*") if weight_col is None else F.sum(F.col(weight_col))
    )
    pos = df.select(
        F.col(segment_col),
        *([F.col(weight_col)] if weight_col else []),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda j: F.struct(
                    j.alias("d"),
                    _cms_bucket(F.col(key_col), j, width).alias("idx"),
                ),
            )
        ).alias("p"),
    ).select(
        segment_col,
        *([weight_col] if weight_col else []),
        F.col("p.d").alias("d"),
        F.col("p.idx").alias("idx"),
    )
    return pos.groupBy(segment_col, "d", "idx").agg(
        n_expr.cast("bigint").alias("n")
    )


def cms_merge(partials: DataFrame) -> DataFrame:
    """Sum counters across segments → (d, idx, n). The merge shuffles
    at most depth × width rows per segment — sketch-sized, not
    data-sized."""
    return partials.groupBy("d", "idx").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key: min over depth of its counter cells.

    Returns (key, cms_est). Collisions only ever ADD counts, so
    ``cms_est >= true count`` unconditionally — the property the
    certificate entry pins. Probe cost: |keys| × depth lookups via one
    join against the counter table (broadcast — it is sketch-sized).
    """
    pos = keys.select(
        F.col(key_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(depth - 1)),
                lambda j: F.struct(
                    j.alias("d"),
                    _cms_bucket(F.col(key_col), j, width).alias("idx"),
                ),
            )
        ).alias("p"),
    ).select(key_col, F.col("p.d").alias("d"), F.col("p.idx").alias("idx"))
    joined = pos.join(F.broadcast(counters), ["d", "idx"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).cast("bigint").alias("cms_est")
    )
