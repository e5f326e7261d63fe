"""Deduplication operators for large-scale corpus curation.

The reference has no dedup surface (its only related op is SELECT
DISTINCT, pandas_sql_functionality_test.py:108-118); these are the
north-star extensions from BASELINE.json, designed Spark-first for
100 TB:

- signatures (minhash / simhash) are computed map-side with built-in
  JVM expressions — no shuffle, no Python, no driver involvement;
- candidate generation shuffles on *fixed-width hash keys* (band
  buckets), never on raw text;
- pair verification happens only within buckets (LSH guarantees the
  candidate set is tiny relative to the cross product);
- survivors are chosen deterministically (min id per group) so reruns
  and oracle comparisons are stable.

All functions return lazy DataFrames; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "simhash_bits",
    "simhash_candidate_pairs",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "embedding_dedup",
]


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (the min ``id_col``) per distinct ``cols``.

    Scale notes: groups on ``xxhash64(cols)`` — a fixed 8-byte shuffle
    key — instead of potentially-multi-KB raw values, then rejoins the
    winner ids. Collision probability at 100 TB (~2^40 docs) against a
    64-bit space is ~2^-24 per pair-bucket; acceptable for corpus
    dedup (use ``cols`` + length guard if not).
    """
    key = F.xxhash64(*[F.col(c) for c in cols])
    winners = (
        df.select(F.col(id_col), key.alias("__k"))
        .groupBy("__k")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, on=id_col, how="inner")


# --------------------------------------------------------------------------
# minhash LSH
# --------------------------------------------------------------------------


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as an array<string>, JVM-side.

    Short documents (< k words) get their whole text as one shingle so
    they still participate.
    """
    words = F.split(F.trim(F.lower(text)), r"\s+")
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, k)),
    )
    return F.array_distinct(shingles)


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: array of ``num_hashes`` 64-bit minima.

    Each permutation is ``xxhash64(shingle, seed_i)`` — computed in one
    codegen'd projection per row, no shuffle, no UDF.
    """
    def perm(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(shingles, perm(i))) for i in range(num_hashes)]
    )


def _banded(sig_df: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """Explode a signature into (band, bucket_hash, id) rows."""
    rows = num_hashes // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(",", *[F.col("__sig")[b * rows + r] for r in range(rows)])
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(F.col(id_col), F.explode(band_cols).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) from banded minhash.

    Pipeline: signature (map-side) → explode bands → self-join on
    (band, bucket) → distinct pairs. ``max_bucket`` caps pathological
    buckets (boilerplate text at web scale produces million-doc
    buckets whose pair expansion is quadratic — the cap bounds the
    worst case; capped buckets are near-identical anyway and exact
    dedup already catches them).
    """
    sig = df.select(
        F.col(id_col), minhash_signature(word_shingles(F.col(text_col), shingle_k), num_hashes).alias("__sig")
    )
    banded = _banded(sig, id_col, num_hashes, bands)
    sized = banded.withColumn(
        "__n", F.count("*").over(Window.partitionBy("band", "bucket"))
    )
    banded = sized.filter(F.col("__n") <= max_bucket).drop("__n")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Verify candidate (id_a, id_b) pairs with exact shingle Jaccard.

    Joins the shingle sets back onto the (small) candidate pair table
    and computes |∩|/|∪| with built-in array functions. Returns pairs
    with ``jaccard >= threshold``.
    """
    sh = df.select(F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("__sh"))
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= threshold)


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-duplicate removal: keep a row unless it duplicates a
    smaller-id row (greedy, deterministic).

    Candidate pairs via banded minhash LSH, verified with exact
    Jaccard. Greedy min-id survivorship (not transitive closure): a
    doc is dropped iff some verified duplicate has a smaller id —
    the standard single-pass policy for corpus dedup; full
    connected-components would need an iterative job.
    """
    pairs = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands, shingle_k)
    dups = ngram_jaccard_pairs(df, pairs, id_col, text_col, shingle_k, threshold)
    losers = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def simhash_bits(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash as a BIGINT, fully JVM-side.

    For each token, ``xxhash64(token)`` supplies the bit pattern; the
    signature bit b is 1 iff more tokens have bit b set than unset.
    Implemented with aggregate-over-array expressions (one projection,
    no shuffle): per bit, sum(+1/-1) over tokens, then pack signs.
    """
    tokens = F.array_distinct(F.split(F.trim(F.lower(text)), r"\s+"))
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def bit_sum(b: int) -> Column:
        # +1 if bit set else -1, summed over tokens (shiftright avoids
        # Python-side 1<<63 signed-long overflow)
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) != 0, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            bit_sum(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_candidate_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, chunks: int = 4
) -> DataFrame:
    """Candidate pairs with hamming(simhash) ≤ ``max_hamming``.

    Pigeonhole blocking: split the 64-bit signature into ``chunks``
    16-bit pieces; any pair within distance ``max_hamming < chunks``
    must agree on ≥1 piece, so join on (chunk_idx, chunk_value) —
    fixed-width shuffle keys — then verify with ``bit_count(xor)``.
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    sig = df.select(F.col(id_col), simhash_bits(F.col(text_col)).alias("__sim"))
    pieces = sig.select(
        id_col,
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("__sim", c * width).bitwiseAND(F.lit(mask)).alias("piece"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("p"),
    ).select(id_col, "__sim", F.col("p.chunk").alias("chunk"), F.col("p.piece").alias("piece"))
    a, b = pieces.alias("a"), pieces.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.__sim").bitwiseXOR(F.col("b.__sim"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dedup(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Greedy min-id survivorship over simhash near-duplicate pairs."""
    pairs = simhash_candidate_pairs(df, id_col, text_col, max_hamming)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (norm(a) * norm(b))


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None,
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs (id_a, id_b, cosine) with cosine ≥ threshold.

    ``block_col`` is the blocking key (e.g. a cluster/LSH bucket id):
    the self-join shuffles on it, keeping the pair space per-block.
    With ``block_col=None`` this is the exact quadratic join — only
    for small inputs or broadcast-side dimensions.
    """
    sel = [F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")]
    if block_col:
        sel.append(F.col(block_col).alias("__blk"))
    base = df.select(*sel)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            _cosine(F.col("a.__v"), F.col("b.__v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Greedy min-id survivorship over cosine near-duplicate pairs."""
    pairs = embedding_cosine_pairs(df, id_col, vec_col, block_col, threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")
