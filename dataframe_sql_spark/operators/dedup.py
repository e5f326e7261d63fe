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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lineage import truncate_lineage

__all__ = [
    "exact_dedup",
    "word_shingles",
    "shingle_frame",
    "hashed_shingle_frame",
    "md5_shingle_frame",
    "minhash_signature",
    "minhash_signature_oph",
    "oph_raw_lanes",
    "oph_densify_rotation",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "minhash_band_index",
    "incremental_minhash_dedup",
    "simhash_bits",
    "simhash_candidate_pairs",
    "simhash_dedup",
    "kgram_positions",
    "substring_span_stats",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "embedding_dedup",
    "line_dedup",
    "prefix_filter_pairs",
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


def _shingles_of_words(words: Column, k: int) -> Column:
    """Shingle array from an already-materialized words array.

    ``words`` must be an attribute reference (a column produced by a
    previous projection) or a lambda variable — NOT the raw
    ``split(...)`` expression. Lambda-bearing expressions are excluded
    from Catalyst's common-subexpression elimination, so referencing a
    split expression inside the transform lambda re-tokenizes the text
    once per shingle position — O(words²) per document (measured 6×
    on sf0.1 documents).
    """
    n = F.size(words)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        )
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles as an array<string>, JVM-side.

    Short documents (< k words) get their whole text as one shingle so
    they still participate.

    The split result is bound to a lambda variable via a one-element
    ``transform`` so it is evaluated once per row even inside this
    single expression (see :func:`_shingles_of_words`). Callers doing
    heavy work should still prefer :func:`shingle_frame`, which puts
    the regex tokenization in its own codegen'd projection.
    """
    return F.element_at(
        F.transform(
            F.array(F.split(F.trim(F.lower(text)), r"\s+")),
            lambda words: _shingles_of_words(words, k),
        ),
        1,
    )


def shingle_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    extra_cols: tuple[str, ...] = (),
    out_col: str = "__sh",
) -> DataFrame:
    """(id, *extra_cols, shingle-array) frame via two projections.

    The two-step shape matters for throughput: tokenization (regex
    split) runs in a codegen'd projection, and the interpreted shingle
    transform references the words array as a per-row attribute —
    measured 6× faster than shingling straight off the text column
    at sf0.1.
    """
    words = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__words"),
    )
    return words.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        _shingles_of_words(F.col("__words"), k).alias(out_col),
    )


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


def hashed_shingle_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    extra_cols: tuple[str, ...] = (),
    out_col: str = "__h",
) -> DataFrame:
    """(id, *extra_cols, k-gram-hash array<long>) frame — the
    string-free shingle path for signature algorithms.

    Instead of materializing k-word shingle *strings* (concat_ws per
    position → new byte arrays per shingle), each word is hashed to a
    long once and a shingle's identity is ``xxhash64`` of its k word
    hashes — fixed-width integer ops after one tokenization pass.
    Measured ~5× faster than the string path on sf0.1 documents; use
    it whenever downstream only needs shingle *identity* (minhash,
    simhash, winnowing), and :func:`shingle_frame` when the actual
    strings matter (exact Jaccard oracles, explainability).

    Short documents (< k words) clamp trailing positions to the last
    word, yielding one degenerate shingle — every doc participates.
    Known divergence from the string path: the clamp hashes the word
    REPEATED to k positions, so a 1-word doc "w" and a doc of k
    repeated "w"s produce the same gram hash — degenerate docs collapse
    into one candidate class here, while :func:`word_shingles` keeps
    them distinct. Harmless for candidate generation (verify with exact
    Jaccard downstream, as :func:`ngram_jaccard_pairs` does); use the
    string path when sub-k-word docs must stay distinguishable.
    """
    words = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__words"),
    )
    hashed = words.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.transform(F.col("__words"), lambda w: F.xxhash64(w)).alias("__hw"),
    )
    hw = F.col("__hw")
    n = F.size(hw)
    gram = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
            lambda i: F.xxhash64(
                *[F.element_at(hw, F.least(i + off, n)) for off in range(k)]
            ),
        )
    )
    return hashed.select(
        F.col(id_col), *[F.col(c) for c in extra_cols], gram.alias(out_col)
    )


def md5_shingle_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    out_col: str = "__h",
) -> DataFrame:
    """Engine-portable sibling of :func:`hashed_shingle_frame`: gram
    hash = the top 60 bits of ``md5`` over the k words joined with
    ``\\x1f`` — ``conv(substring(md5(...), 1, 15), 16, 10)`` here,
    ``('0x' || substr(md5(...), 1, 15))::BIGINT`` in DuckDB — so a SQL
    oracle can replay signature algorithms end-to-end (the same trick
    that made the IVF centroid pick replayable). 15 hex chars = 60
    bits keeps the value inside a signed long on both engines; the
    four missing top bits only mean signature bits 60–63 are always
    0, which both engines agree on.

    Same tokenization and short-doc clamp semantics as the xxhash64
    path (positions past the end repeat the last word; grams
    de-duplicated per doc). Production stays on xxhash64 — one 64-bit
    mix per gram beats an md5 digest + hex decode — this exists for
    replay certificates (`dd_simhash_probed_verified`).
    """
    words = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__words"),
    )
    w = F.col("__words")
    n = F.size(w)
    gram = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
            lambda i: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "\x1f",
                            *[
                                F.element_at(w, F.least(i + off, n))
                                for off in range(k)
                            ],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        )
    )
    return words.select(F.col(id_col), gram.alias(out_col))


def oph_raw_lanes(
    hashes: Column, num_hashes: int = 64, value_bits: int = 64
) -> Column:
    """OPH lane minima (array<long> with NULL for empty lanes).

    Classic MinHash costs ``num_hashes`` hash evaluations per shingle
    (one per lane). OPH (Li, Owen & Zhang 2012) pays ONE hash per
    shingle: the hash's top bits pick the lane (here the top 6 bits →
    64 lanes) and the lane keeps its minimum. Measured ~2× faster than
    the per-lane path at sf0.1 (the per-lane work drops from a 64-bit
    hash to a shift + compare). Single map-side projection, no shuffle.

    ``num_hashes`` must be a power of two: the lane index is the top
    ``log2(num_hashes)`` bits of the shingle hash, so a non-power-of-two
    count would silently drop shingles whose top bits exceed the lane
    range (asserted loudly instead).

    ``value_bits`` is the width of the hash values (64 for xxhash64;
    60 for the md5 replay-certificate hashes, whose top 4 bits are
    always zero — the lane must come from the top OCCUPIED bits or
    every shingle would land in lane 0).
    """
    assert num_hashes & (num_hashes - 1) == 0 and num_hashes > 0, (
        f"num_hashes must be a power of two, got {num_hashes}"
    )
    shift = value_bits - (num_hashes - 1).bit_length()  # top bits → lane index
    return F.array(
        *[
            F.array_min(
                F.filter(hashes, lambda h: F.shiftrightunsigned(h, shift) == F.lit(i))
            )
            for i in range(num_hashes)
        ]
    )


def oph_densify_rotation(lanes: Column, num_hashes: int = 64) -> Column:
    """Fill empty OPH lanes by borrowing the nearest occupied lane to
    the right (circular) — "densified OPH via rotation" (Shrivastava &
    Li 2014).

    Why not the simpler ``xxhash64(global_min, lane)`` fill this repo
    originally used: under band-LSH the global-min fill fails in a
    CORRELATED way. A short doc occupies only a few of the 64 lanes, so
    ~50+ lanes are densified; if the two docs of a near-dup pair differ
    in their global minimum (probability 1-J — one unshared shingle can
    be the min), every densified lane diverges at once and the pair
    cannot share any band that touches a densified lane. Band-miss
    probability degrades from (1-J^r)^b to ~(1-J), and the
    ``dd_minhash_verified`` certificate caught exactly that: a 16-word
    pair with Jaccard 13/14 ≈ 0.93 missed by LSH. Rotation borrows a
    lane-local value instead, so densified lanes of similar docs agree
    wherever the borrowed source lane agrees — errors stay local and
    the banding arithmetic holds for short docs too (the dominant shape
    in web corpora at 100 TB).

    ``lanes`` should be a MATERIALIZED column (select the raw lanes in
    a prior projection): it is referenced several times here, and
    lambda-bearing expressions are excluded from Catalyst's
    subexpression elimination, so inlining ``oph_raw_lanes`` directly
    would recompute the 64 lane filters per reference. All-null input
    (impossible for non-empty shingle sets) yields an all-null
    signature rather than an error.
    """
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    occ = F.filter(idx, lambda i: F.element_at(lanes, i + 1).isNotNull())
    return F.transform(
        idx,
        lambda i: F.coalesce(
            F.element_at(lanes, i + 1),
            F.element_at(
                lanes,
                F.element_at(F.concat(F.filter(occ, lambda j: j >= i), occ), 1) + 1,
            ),
        ),
    )


def minhash_signature_oph(hashes: Column, num_hashes: int = 64) -> Column:
    """OPH signature with rotation densification, as one Column.

    Composition of :func:`oph_raw_lanes` and
    :func:`oph_densify_rotation` — convenient for tests and one-off
    frames, but in hot paths select the raw lanes into a column first
    and densify in a second projection (see
    :func:`minhash_candidate_pairs`): inlined, the lane array is
    recomputed per densify reference (no subexpression elimination for
    lambda-bearing expressions).
    """
    return oph_densify_rotation(oph_raw_lanes(hashes, num_hashes), num_hashes)


def _banded(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    bucket_hash: str = "xx",
) -> DataFrame:
    """Explode a signature into (band, bucket_hash, id) rows.

    ``bucket_hash="md5"`` keys buckets by the md5 hex of the same
    comma-joined slot string instead of xxhash64 — identical grouping
    semantics (both are injective-modulo-collision over the slot
    tuple), but SQL-replayable for the banding replay certificate."""
    rows = num_hashes // bands

    def _bucket(b: int) -> Column:
        slots = F.concat_ws(
            ",", *[F.col("__sig")[b * rows + r] for r in range(rows)]
        )
        return F.md5(slots) if bucket_hash == "md5" else F.xxhash64(slots)

    band_cols = F.array(
        *[
            F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
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
    feature_hash: str = "xx",
    pre_shingled: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) from banded minhash.

    Pipeline: materialize shingles → materialize signature → explode
    bands → groupBy bucket → explode pairs. The two explicit
    ``select`` stages matter: lambda-bearing expressions are excluded
    from Catalyst's subexpression elimination, so computing all 64
    hash lanes directly over ``word_shingles(text)`` re-tokenizes the
    text 64× — materializing the array column first makes each lane
    read the same array.

    Pair generation is a single shuffle (groupBy band+bucket →
    collect_list → quadratic explode within the bucket) instead of a
    self-join, so the signature lineage is computed exactly once.
    ``max_bucket`` caps pathological buckets (boilerplate at web scale
    produces million-doc buckets with quadratic pair expansion; capped
    buckets are near-identical and exact dedup already catches them).

    Signatures go through the string-free hashed-shingle + OPH path
    (:func:`hashed_shingle_frame`, :func:`minhash_signature_oph`) —
    ~2× the throughput of per-lane hashing of shingle strings.

    ``feature_hash="md5"`` swaps shingle hashing to the 60-bit
    engine-portable md5 form and the band-bucket hash to md5, so a
    SQL oracle replays lanes, densification, banding, and bucketing
    verbatim (the `dd_minhash_banded_verified` certificate); the OPH
    lane math, rotation fill, caps, and pair generation are the same
    production code either way.

    ``pre_shingled`` (r14): an ALREADY-MATERIALIZED gram-hash frame
    (``hashed_shingle_frame`` shape, ``__h`` column) shared with a
    downstream verifier — when given, the tokenize+gram pass is
    neither re-run nor re-materialized here, and the signature kernel
    needs no lineage cut of its own (its parent is materialized and it
    feeds a single consumer chain).
    """
    if pre_shingled is not None:
        # public-API argument contract: ValueError, not assert — under
        # `python -O` an assert vanishes and a mismatched caller would
        # silently bucket-hash 60-bit md5 grams with the 64-bit path
        # (advisor note, r15)
        if feature_hash != "xx":
            raise ValueError(
                "pre_shingled shares the xxhash64 path; got "
                f"feature_hash={feature_hash!r}"
            )
        shingled, value_bits, bucket_hash = pre_shingled, 64, "xx"
    elif feature_hash == "md5":
        shingled = md5_shingle_frame(df, id_col, text_col, shingle_k)
        value_bits, bucket_hash = 60, "md5"
    else:
        shingled = hashed_shingle_frame(df, id_col, text_col, shingle_k)
        value_bits, bucket_hash = 64, "xx"
    # OPH lanes + rotation densify via the Arrow-vectorized kernel
    # (functions/npsig.py): bit-exact vs the oph_raw_lanes/
    # oph_densify_rotation expression pair (pytest-asserted), replacing
    # the interpreted 64-lane-filter + densify projections that were
    # ~2 s of the sf0.1 pipeline (guide §4.2; OPTIMIZATION_r14.md).
    from ..functions.npsig import oph_signature_vec

    sig = shingled.select(
        F.col(id_col),
        oph_signature_vec(F.col("__h"), num_hashes, value_bits).alias("__sig"),
    )
    if pre_shingled is None:
        # materialize the signature table once (truncate_lineage —
        # guide §8's "decide with small rows": id + 64 longs per doc,
        # ~0.5 KB/row vs the multi-KB text). The nondeterministic Arrow
        # kernel defeats Catalyst's subtree canonicalization, so WITHOUT
        # this cut every downstream branch re-runs tokenize→gram-hash→OPH
        # from the raw scan (measured: 6 parquet scans / 2 ArrowEvalPython
        # in the dd_minhash_pairs plan, 0 ReusedExchange).
        sig = truncate_lineage(sig)
    banded = _banded(sig, id_col, num_hashes, bands, bucket_hash)
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list(id_col).alias("__ids"))
        .filter((F.size("__ids") >= 2) & (F.size("__ids") <= max_bucket))
    )
    return (
        buckets.select(F.explode("__ids").alias("id_a"), F.col("__ids"))
        .select("id_a", F.explode("__ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hashed: bool = False,
    feature_hash: str = "xx",
    pre_shingled: DataFrame | None = None,
) -> DataFrame:
    """Verify candidate (id_a, id_b) pairs with exact shingle Jaccard.

    Joins the shingle sets back onto the (small) candidate pair table
    and computes |∩|/|∪| with built-in array functions. Returns pairs
    with ``jaccard >= threshold``.

    ``hashed=True`` verifies over the 8-byte gram-hash sets
    (:func:`hashed_shingle_frame`) instead of shingle strings —
    identical Jaccard up to an in-document xxhash64 collision
    (~n²/2⁶⁴ ≈ 1e-13) and ~5× cheaper to tokenize; the production
    default for LSH pipelines. Keep strings where bit-exact parity
    with a string-based oracle matters (``dd_minhash_verified``).
    """
    if pre_shingled is not None:
        # r14: a shared ALREADY-MATERIALIZED gram frame (e.g. the one
        # the LSH candidate generator signed) — rename to the verify
        # column, skip the second tokenize pass and its second cut.
        # ValueError, not assert: survives `python -O` (advisor, r15)
        if not (hashed and feature_hash == "xx"):
            raise ValueError(
                "pre_shingled requires hashed=True with the xxhash64 "
                f"path; got hashed={hashed!r}, feature_hash={feature_hash!r}"
            )
        sh = pre_shingled.withColumnRenamed("__h", "__sh")
    else:
        if hashed and feature_hash == "md5":
            sh = md5_shingle_frame(df, id_col, text_col, shingle_k, out_col="__sh")
        elif hashed:
            sh = hashed_shingle_frame(
                df, id_col, text_col, shingle_k, out_col="__sh"
            )
        else:
            sh = shingle_frame(df, id_col, text_col, shingle_k)
        # r14: materialize the shingle-set frame once — it feeds BOTH
        # join sides below, and the lambda-bearing gram projection
        # defeats subtree canonicalization, so without the cut the
        # corpus is tokenized twice (guide §8: compute the fingerprint
        # pass once, then attach decisions to it).
        sh = truncate_lineage(sh)
    # merge hints: the shingle-set sides carry a per-doc array column,
    # which Catalyst's width estimator counts as ONE element
    # (ArrayType.defaultSize) — so a corpus-scaled multi-GB side can sit
    # under the broadcast threshold in the mid-scale window and die at
    # the driver collect under memory pressure (the round-10
    # prefix_filter_pairs class; tools/broadcast_audit.py flagged this
    # join at 10× estimates). Sort-merge is the spill-safe shape and
    # the candidate table is already id-keyed, so the exchange is the
    # honest cost.
    # r14 (guide §2.3): no array_union — every shingle frame emits a
    # DISTINCT gram set, so |A∪B| = |A| + |B| − |A∩B| exactly
    # (inclusion-exclusion; F.size is O(1) on the carried arrays).
    # Same int/int division, bit-identical jaccard, half the per-pair
    # array CPU of computing intersect AND union.
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    j = (
        pairs.join(
            sh.withColumnRenamed(id_col, "id_a")
            .withColumnRenamed("__sh", "sh_a")
            .hint("merge"),
            "id_a",
        )
        .join(
            sh.withColumnRenamed(id_col, "id_b")
            .withColumnRenamed("__sh", "sh_b")
            .hint("merge"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            inter / (F.size("sh_a") + F.size("sh_b") - inter),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= threshold)


def blocked_ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    shingle_k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs within a blocking key.

    The non-LSH member of the dedup family (reference has no dedup at
    all — SURVEY §2.12): candidate pairs come from equality blocking
    (``block_cols``, e.g. (lang, source) or a cluster id) rather than
    minhash bands, and similarity is the *exact* shingle-set Jaccard.
    Returns (id_a, id_b, inter, uni, jaccard) for pairs with
    ``jaccard >= threshold``; ``inter``/``uni`` are integer set sizes
    so cross-engine comparisons don't hinge on float rounding.

    Scale notes: the self-join shuffles on the blocking key only; cost
    is quadratic per block, so block keys must bound group size (at
    100 TB: block on LSH buckets or cluster ids, not coarse labels).
    Shingle arrays are materialized before the join so each side
    tokenizes once.
    """
    # merge hint: both self-join sides carry the shingle array, whose
    # width the estimator cannot see (see ngram_jaccard_pairs) — never
    # broadcast a corpus-scaled array side
    sh = shingle_frame(df, id_col, text_col, shingle_k, extra_cols=tuple(block_cols))
    a, b = sh.alias("a"), sh.hint("merge").alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # r14 (guide §2.3): uni by inclusion-exclusion over the distinct
    # gram sets instead of array_union — identical integers (the
    # shingle arrays are distinct at build), half the per-pair CPU
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh")))
    uni = F.size(F.col("a.__sh")) + F.size(F.col("b.__sh")) - inter
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            inter.alias("inter"),
            uni.alias("uni"),
            (inter.cast("double") / uni).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    feature_hash: str = "xx",
) -> DataFrame:
    """Near-duplicate removal: keep a row unless it duplicates a
    smaller-id row (greedy, deterministic).

    Candidate pairs via banded minhash LSH, verified with exact
    Jaccard. Greedy min-id survivorship (not transitive closure): a
    doc is dropped iff some verified duplicate has a smaller id —
    the standard single-pass policy for corpus dedup; full
    connected-components would need an iterative job.
    """
    pairs = minhash_candidate_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_k,
        feature_hash=feature_hash,
    )
    dups = ngram_jaccard_pairs(
        df, pairs, id_col, text_col, shingle_k, threshold, hashed=True,
        feature_hash=feature_hash,
    )
    losers = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# exact substring-span dedup (Lee et al. 2022-style measurement)
# --------------------------------------------------------------------------


def kgram_positions(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Positional k-word-gram hashes: one row per (id, pos, gram hash).

    Unlike :func:`hashed_shingle_frame` this keeps *positions* and
    duplicates — the raw material for exact substring analysis. Grams
    are ``xxhash64`` of the k word hashes starting at ``pos`` (trailing
    positions clamp to the last word). The explode fans out to
    ~n_words rows per doc but stays partition-local (no shuffle until
    the caller aggregates).
    """
    words = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__words"),
    )
    hashed = words.select(
        F.col(id_col),
        F.transform(F.col("__words"), lambda w: F.xxhash64(w)).alias("__hw"),
    )
    hw = F.col("__hw")
    n = F.size(hw)
    grams = hashed.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
                lambda i: F.xxhash64(
                    *[F.element_at(hw, F.least(i + off, n)) for off in range(k)]
                ),
            )
        ).alias("__p0", "gh"),
    )
    return grams.select(F.col(id_col), (F.col("__p0") + 1).alias("pos"), "gh")


def substring_span_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Per-document duplicated-substring coverage — the measurement
    behind exact substring dedup ("Deduplicating Training Data Makes
    Language Models Better", Lee et al. 2022): any word k-gram that
    occurs more than once in the corpus marks its k-token span as
    duplicated; a document's ``dup_ratio`` is the fraction of its
    tokens covered by the union of those spans. Curation then drops or
    trims docs above a threshold.

    Plan shape (all fixed-width keys, no strings past tokenization):
    explode to (id, pos, gram-hash) → groupBy gram-hash (8-byte
    shuffle, map-side partial counts) → semi-join duplicated grams
    back onto positions → per-doc interval-union length via one window
    over (id, pos). At 100 TB the gram-count aggregate is the only
    corpus-wide shuffle and it carries 16 bytes/row.

    Returns (id, n_tokens, dup_grams, covered_tokens, dup_ratio),
    one row per input document (zero-filled when nothing repeats).
    """
    from pyspark.sql import Window

    grams = kgram_positions(df, id_col, text_col, k)
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("gh")
    )
    dup_pos = grams.join(dup, on="gh", how="left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    # union length of fixed-length-k intervals sorted by start:
    # every gap to the next start contributes min(k, gap); the last
    # interval contributes k.
    covered = (
        dup_pos.withColumn("__next", F.lead("pos").over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dup_grams"),
            F.sum(
                F.when(F.col("__next").isNull(), F.lit(k)).otherwise(
                    F.least(F.lit(k), F.col("__next") - F.col("pos"))
                )
            ).alias("covered_tokens"),
        )
    )
    n_tok = df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("n_tokens"),
    )
    return n_tok.join(covered, on=id_col, how="left").select(
        id_col,
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.coalesce("dup_grams", F.lit(0)).cast("bigint").alias("dup_grams"),
        # clamp: a shorter-than-k doc's single degenerate gram spans k
        # tokens on paper but the doc only has n_tokens
        F.least(F.coalesce("covered_tokens", F.lit(0)), F.col("n_tokens"))
        .cast("bigint")
        .alias("covered_tokens"),
        (
            F.least(F.coalesce("covered_tokens", F.lit(0)), F.col("n_tokens")).cast(
                "double"
            )
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("dup_ratio"),
    )


def substring_span_remove(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Exact substring-span REMOVAL (the action behind
    :func:`substring_span_stats`'s measurement): rewrite every document
    with corpus-duplicated k-gram spans cut out, keeping the globally
    first occurrence of each gram (Lee et al. 2022 keep-one policy —
    deterministic: first = min (id, pos) over the corpus).

    Plan shape: positional gram hashes (map-side) → one row_number
    window on the 8-byte gram hash (THE corpus-wide shuffle — same key
    and volume as the stats aggregate) → non-first occurrences explode
    to their k covered token positions (bounded ×k fan-out) → tokens
    anti-join coverage → per-doc ordered rebuild (collect_list +
    array_sort, deterministic because positions are unique). Documents
    whose every token is covered survive with empty text, so row count
    is input-stable.

    The text is deliberately tokenized TWICE (once per scan: gram
    branch and rebuild branch). The alternative — one positional
    explode feeding both branches — would need either a materialized
    intermediate larger than the input or a lead(k-1) window adding a
    second per-doc shuffle; at scale a repeated codegen split in an
    extra scan is cheaper than an extra exchange.

    Returns (id, clean_text, kept_tokens).
    """
    from pyspark.sql import Window

    grams = kgram_positions(df, id_col, text_col, k)
    w = Window.partitionBy("gh").orderBy(F.col(id_col), F.col("pos"))
    dup_occ = grams.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") > 1
    )
    covered = dup_occ.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("p"),
    ).distinct()
    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("__p0", "__w"),
    ).select(F.col(id_col), (F.col("__p0") + 1).alias("p"), "__w")
    kept = words.join(covered, on=[id_col, "p"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "__w"))),
                lambda x: x["__w"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n"),
    )
    return df.select(F.col(id_col)).join(rebuilt, on=id_col, how="left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("__n", F.lit(0)).cast("bigint").alias("kept_tokens"),
    )


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------


def simhash_bits(hashes_col: str, bits: int = 64) -> Column:
    """64-bit SimHash over a *materialized* array<long> column of
    feature hashes, fully JVM-side.

    Signature bit b is 1 iff more features have bit b set than unset.
    Implemented as ``bits`` flat integer aggregates (one per bit) over
    the long array plus a constant-folded packing sum. Each aggregate
    is allocation-free scalar arithmetic; the previous single-pass
    array<int>-accumulator version allocated a 64-int array per
    element (zip_with + transform) and measured ~1.5× slower at sf0.1
    despite traversing the array once — per-element allocation costs
    more than extra traversals of an on-heap long array.

    Two more formulations were measured and rejected (sf0.1, warm,
    identical output checksums): packing 4 16-bit counters per long to
    cut the passes to 16 (1.43 s vs 1.16 s — the fatter lambda body
    costs more than the saved traversals), and exploding features into
    rows with 64 codegen'd SUMs under groupBy(id) (12.5 s — the
    explode+shuffle of ~300 rows/doc dwarfs every lambda cost).
    """
    n = F.size(F.col(hashes_col))

    def bit_count(b: int) -> Column:
        return F.aggregate(
            F.col(hashes_col),
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
        )

    packed: Column | None = None
    for b in range(bits):
        term = F.when(
            bit_count(b) * 2 > n, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    assert packed is not None
    return packed


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
    feature_k: int = 2,
    max_bucket: int = 1000,
    probe_bits: int = 0,
    feature_hash: str = "xx",
) -> DataFrame:
    """Candidate pairs with hamming(simhash) ≤ ``max_hamming``.

    Features are ``feature_k``-word shingles (k=2 default: unigram
    sets are too coarse on small-vocabulary corpora). Pigeonhole
    blocking: split the 64-bit signature into ``chunks`` 16-bit
    pieces; any pair within distance ``chunks - 1`` must agree on ≥1
    piece, so join on (chunk_idx, chunk_value) — fixed-width shuffle
    keys — then verify with ``bit_count(xor)``.

    ``probe_bits=1`` multi-probes each chunk (the exact piece plus
    every 1-bit flip), extending the COMPLETE radius from
    ``chunks - 1`` to ``2·chunks - 1``: a pair at distance ≤ 2c−1 has
    (pigeonhole) some chunk differing by ≤ 1 bit, which a flipped
    probe hits. This is the scale-correct radius knob — the
    alternative (narrower chunks, e.g. 8×8-bit) multiplies expected
    bucket occupancy by 256 on random corpora (quadratic candidate
    blowup), while probing multiplies *keys* by width+1 (linear) and
    keeps the 16-bit low-collision pieces. Measured at sf0.01: default
    finds 19/25 of exact-Jaccard≥0.8 pairs (radius 3 binds);
    probe_bits=1 + max_hamming=7 finds 22/25, and the remaining 3 sit
    at hamming 8–10 — outside any practical simhash radius, the
    featurization limit (use minhash when recall at high J must be
    guaranteed; see COVERAGE.md).

    Bucket note: on low-entropy corpora (shared boilerplate/vocabulary)
    the bit majorities converge and single (chunk, piece) buckets can
    hold a large share of the corpus — quadratic candidates.
    ``max_bucket`` caps those; a pair only needs ONE uncapped shared
    chunk to surface, so moderate caps cost little recall.

    ``feature_hash="md5"`` swaps the per-gram hash to the
    engine-portable 60-bit md5 form (:func:`md5_shingle_frame`) so a
    SQL oracle can replay the whole pipeline; every other line of this
    function — signature, chunking, probing, caps, verify — runs
    unchanged, which is exactly what the replay certificate certifies.
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    hasher = {"xx": hashed_shingle_frame, "md5": md5_shingle_frame}[feature_hash]
    hashed = hasher(df, id_col, text_col, feature_k).withColumnRenamed(
        "__h", "__th"
    )
    # signature via the Arrow-vectorized kernel (functions/npsig.py):
    # bit-exact vs simhash_bits (pytest-asserted) at ~1/25th the CPU —
    # the interpreted 64-aggregate projection was the pipeline's
    # dominant cost (guide §4.2; OPTIMIZATION_r14.md).
    from ..functions.npsig import simhash_bits_vec

    # The isNotNull pair is a runtime no-op (ids and signatures are
    # never null) but load-bearing for the probed self-join's exchange
    # reuse: the `a.id < b.id` predicate infers the same constraints and
    # pushes them below the UDF on the probe side only (the bucket-cap
    # window blocks the pushdown on the other side), making the two
    # exchange subtrees canonically unequal. Present from the start,
    # the constraint already holds on both sides and nothing is cloned.
    sig = hashed.select(
        F.col(id_col), simhash_bits_vec(F.col("__th")).alias("__sim")
    ).filter(F.col(id_col).isNotNull() & F.col("__sim").isNotNull())

    def piece_struct(c: int, flip: int) -> Column:
        base = F.shiftright("__sim", c * width).bitwiseAND(F.lit(mask))
        if flip:
            base = base.bitwiseXOR(F.lit(flip))
        return F.struct(F.lit(c).alias("chunk"), base.alias("piece"))

    exact = sig.select(
        F.struct(F.col(id_col).alias("id"), F.col("__sim").alias("sim")).alias("item"),
        F.explode(
            F.array(*[piece_struct(c, 0) for c in range(chunks)])
        ).alias("p"),
    ).select("item", F.col("p.chunk").alias("chunk"), F.col("p.piece").alias("piece"))

    if probe_bits == 0:
        buckets = (
            exact.groupBy("chunk", "piece")
            .agg(F.collect_list("item").alias("__items"))
            .filter((F.size("__items") >= 2) & (F.size("__items") <= max_bucket))
        )
        pairs = (
            buckets.select(F.explode("__items").alias("a"), F.col("__items"))
            .select("a", F.explode("__items").alias("b"))
            .filter(F.col("a.id") < F.col("b.id"))
        )
    else:
        assert probe_bits == 1, "only 1-bit probing is implemented"
        # r14 single-signature shape: BOTH join sides derive from ONE
        # exploded key frame (probe keys = exact keys ∪ 1-bit flips),
        # projected to the same (item, chunk, piece) columns, so the
        # candidate self-join plans one Exchange + a ReusedExchange and
        # the featurization+signature subtree runs ONCE. The previous
        # three-branch form (probes / exact / ok) recomputed the
        # signature pass per branch — 3 corpus scans at any scale
        # (plans/r14/dd_simhash_probed_{before,after}.txt).
        #
        # A row is an EXACT key (flip == 0) iff its piece equals the
        # piece recomputed from its own signature — checked
        # post-exchange so no flip column rides the shuffle (a flip tag
        # would be pruned off the probe side only, making the two
        # exchange subtrees canonically unequal and defeating reuse).
        allk = sig.select(
            F.struct(
                F.col(id_col).alias("id"), F.col("__sim").alias("sim")
            ).alias("item"),
            F.explode(
                F.array(
                    *[
                        piece_struct(c, flip)
                        for c in range(chunks)
                        for flip in [0] + [1 << j for j in range(width)]
                    ]
                )
            ).alias("p"),
        ).select("item", F.col("p.chunk").alias("chunk"), F.col("p.piece").alias("piece"))
        # r14: materialize the exploded key frame once. The intended
        # one-Exchange + ReusedExchange self-join never planned once
        # the signature moved to the nondeterministic Arrow kernel
        # (nondeterministic expressions are never sameResult, so the
        # two sides each re-ran featurize→sign→explode from the raw
        # scan — 6 scans in the HEAD plan). The key frame is small
        # fixed-width rows ((id, sim) struct + chunk + piece); after
        # the cut both join sides and the bucket-cap window scan the
        # same materialized RDD.
        allk = truncate_lineage(allk)
        is_exact = F.expr(
            f"piece = (shiftright(item.sim, chunk * {width}) & {mask})"
        )
        # cap on EXACT bucket size (the probe side only multiplies
        # keys): a window count over the already-partitioned keys —
        # the (chunk, piece) sort it needs is the one the sort-merge
        # join performs anyway, so the cap costs no extra pass.
        from pyspark.sql import Window

        wb = Window.partitionBy("chunk", "piece")
        ex = (
            allk.withColumn(
                "__exn",
                F.sum(F.when(is_exact, 1).otherwise(0)).over(wb),
            )
            .filter(is_exact & (F.col("__exn") <= max_bucket))
            .select(F.col("item").alias("b"), "chunk", "piece")
        )
        # merge hint: both probe and exact sides are post-explode
        # streams (rows × probes-per-signature) — count AND width blind
        # to the estimator; never broadcast (broadcast_audit finding)
        pairs = (
            allk.select(
                F.col("item").alias("a"), "chunk", "piece"
            )
            .join(ex.hint("merge"), ["chunk", "piece"])
            .filter(F.col("a.id") < F.col("b.id"))
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        # hamming BEFORE distinct: the verify predicate is a per-row
        # projection, so filtering first is semantically identical but
        # the dedup exchange now carries only verified near-pairs —
        # on random corpora the vast majority of bucket candidates
        # (and their up-to-4·(probes+1)-fold key duplicates) fail the
        # radius and never shuffle
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    probe_bits: int = 0,
    feature_hash: str = "xx",
) -> DataFrame:
    """Greedy min-id survivorship over simhash near-duplicate pairs."""
    pairs = simhash_candidate_pairs(
        df, id_col, text_col, max_hamming, probe_bits=probe_bits,
        feature_hash=feature_hash,
    )
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

    Input invariants (r15, advisor note): rows with a null id, a null
    block key, or an empty vector are EXCLUDED up front — the
    self-join form never pairs them anyway (null comparisons are
    filtered), and the explicit filter makes the numpy kernel path
    (where a null group IS pairable and empty vectors crash
    ``np.stack``) agree with it by construction. Vectors must share
    one dimensionality; ragged inputs raise inside the kernel rather
    than silently dropping (the join form nulls them out). Zero-norm
    vectors yield NaN cosine, which PASSES the threshold on both
    paths (Spark orders NaN greatest; the kernel keeps
    ``~(cos < threshold)``).
    """
    from pyspark.sql.types import IntegralType

    sel = [F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")]
    if block_col:
        sel.append(F.col(block_col).alias("__blk"))
    base = df.select(*sel).filter(
        F.col(id_col).isNotNull() & (F.size("__v") > 0)
    )
    if block_col:
        base = base.filter(F.col("__blk").isNotNull())
    id_type = dict(zip(base.schema.names, base.schema))[id_col].dataType
    if block_col and isinstance(id_type, IntegralType):
        # r14 (guide §4.2/§8): per-block pairs through ONE numpy
        # applyInPandas kernel instead of a self-join whose output
        # carries BOTH dim-wide vectors on every candidate row and
        # evaluates the interpreted cosine fold per pair (measured
        # 11-12 s of the sf0.1 funnel wall; the kernel form is ~1 s).
        # Vectors cross the Arrow boundary once per block (n rows, not
        # n² pairs); scores replicate the fold BIT-FOR-BIT (elementwise
        # products + sequential cumsum + trailing +0.0, sqrt, same
        # division order — the knn_join_cells_cogrouped discipline,
        # pytest-asserted there), and only pairs that pass the
        # threshold leave the kernel. Integral ids only: the kernel
        # orders pairs by numpy int comparison, identical to Spark's;
        # other id types keep the join form below.
        import numpy as np
        import pandas as pd

        def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            V = np.stack(
                [np.asarray(v, np.float64) for v in pdf["__v"].to_numpy()[order]]
            )
            nrm = np.sqrt(np.cumsum(V * V, axis=1)[:, -1] + 0.0)
            d = V.shape[1]
            step = max(1, (4 << 20) // max(1, n * d))
            outs = []
            for s in range(0, n, step):
                Vs = V[s : s + step]
                dots = (
                    np.cumsum(Vs[:, None, :] * V[None, :, :], axis=2)[:, :, -1]
                    + 0.0
                )
                cos = dots / (nrm[s : s + step, None] * nrm[None, :])
                # upper triangle by id order: row (global r) pairs with
                # every column c > r — id uniqueness makes sorted index
                # order the id order
                # ~(cos < t), not (cos >= t): NaN (zero-norm vectors)
                # must PASS, matching Spark's NaN-greatest ordering on
                # the expression path (advisor note, r15)
                r_idx, c_idx = np.nonzero(
                    (np.arange(n)[None, :] > (s + np.arange(len(Vs)))[:, None])
                    & ~(cos < threshold)
                )
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[s + r_idx],
                            "id_b": ids[c_idx],
                            "cosine": cos[r_idx, c_idx],
                        }
                    )
                )
            return pd.concat(outs, ignore_index=True)

        t = id_type.simpleString()
        return base.groupBy("__blk").applyInPandas(
            block_pairs, schema=f"`id_a` {t}, `id_b` {t}, `cosine` double"
        )
    # merge hint: the vector side's width is estimator-blind
    # (ArrayType.defaultSize counts one element), so a corpus-scaled
    # embedding side can slip under the broadcast threshold while being
    # GBs in memory — the round-10 broadcast_audit class
    a, b = base.alias("a"), base.hint("merge").alias("b")
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


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    feature_hash: str = "xx",
) -> DataFrame:
    """(id, band, bucket) MinHash band index for a corpus — the
    persistable artifact incremental dedup joins new batches against.

    Write it partitioned/bucketed by (band, bucket) so the incremental
    join is a pruned scan, not a full-index shuffle:
    ``write_bucketed(index, "minhash_index", ["band", "bucket"])``.
    """
    if feature_hash == "md5":
        shingled = md5_shingle_frame(df, id_col, text_col, shingle_k)
        value_bits, bucket_hash = 60, "md5"
    else:
        shingled = hashed_shingle_frame(df, id_col, text_col, shingle_k)
        value_bits, bucket_hash = 64, "xx"
    # OPH lanes + rotation densify via the Arrow-vectorized kernel
    # (functions/npsig.py): bit-exact vs the oph_raw_lanes/
    # oph_densify_rotation expression pair (pytest-asserted), replacing
    # the interpreted 64-lane-filter + densify projections that were
    # ~2 s of the sf0.1 pipeline (guide §4.2; OPTIMIZATION_r14.md).
    from ..functions.npsig import oph_signature_vec

    sig = shingled.select(
        F.col(id_col),
        oph_signature_vec(F.col("__h"), num_hashes, value_bits).alias("__sig"),
    )
    return _banded(sig, id_col, num_hashes, bands, bucket_hash)


def incremental_minhash_dedup(
    new_df: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 1000,
    feature_hash: str = "xx",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW batch against an existing corpus band index, without
    re-signaturing the corpus — the production shape at 100 TB, where
    the historical index is written once (see
    :func:`minhash_band_index`) and each ingest batch only signatures
    its own documents.

    Returns ``(kept, index_delta)``: ``kept`` is the new rows that
    collide with neither the historical index nor an earlier
    (smaller-id) row of their own batch; ``index_delta`` is the band
    rows of the kept docs, to be appended to the index for the next
    batch.

    Plan shape: one signature projection over the batch, one
    (band, bucket) semi-join against the index (AQE broadcasts the
    batch side when small — the common case), one within-batch LSH
    pass. No corpus-sized shuffle anywhere.
    """
    new_banded = minhash_band_index(
        new_df, id_col, text_col, num_hashes, bands, shingle_k, feature_hash
    )
    # Collide against history on fixed-width (band, bucket) keys.
    hit_ids = (
        new_banded.join(index, on=["band", "bucket"], how="left_semi")
        .select(id_col)
        .distinct()
    )
    survivors = new_df.join(hit_ids, on=id_col, how="left_anti")
    # Batch-internal near-dups among the remaining rows.
    kept = minhash_dedup(
        survivors, id_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        feature_hash=feature_hash,
    )
    delta = minhash_band_index(
        kept, id_col, text_col, num_hashes, bands, shingle_k, feature_hash
    )
    return kept, delta


# --------------------------------------------------------------------------
# line-level boilerplate removal (RefinedWeb-style)
# --------------------------------------------------------------------------


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_df: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Strip lines that repeat across >= ``min_df`` documents.

    The RefinedWeb / CCNet line-level dedup shape (Penedo et al.,
    "The RefinedWeb Dataset for Falcon LLM"): navigation chrome,
    cookie banners and boilerplate repeat across pages verbatim, so a
    line whose *document frequency* crosses a threshold is dropped
    from every document while unique prose survives. ``delim`` is the
    line separator (``"\\n"`` for real text; tests also use it for
    paragraph mode with ``"\\n\\n"``). Lines shorter than
    ``min_chars`` after trimming are always kept — too short to be
    meaningful boilerplate.

    Output: (id, clean_text, n_kept, n_removed) with the surviving
    lines re-joined by ``delim`` in original order.

    Scale notes: lines explode map-side; the document-frequency
    aggregation shuffles on ``xxhash64(line)`` — a fixed 8-byte key,
    never raw line text; the boilerplate verdict comes back via a
    (line-hash) join that AQE broadcasts when the frequent-line table
    is small (it is: it's the set of lines repeated across documents,
    Zipf-bounded); the rebuild groups on doc id with
    ``sort_array(collect_list(struct(pos, line)))`` — no window, one
    shuffle. Three exchanges total, all on fixed-width or doc-id keys.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(delim))).alias("pos", "line"),
    ).withColumn("__lh", F.xxhash64(F.trim(F.col("line"))))
    eligible = lines.filter(F.length(F.trim(F.col("line"))) >= min_chars)
    boiler = (
        eligible.groupBy("__lh")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("__lh")
    )
    flagged = lines.join(
        boiler.withColumn("__drop", F.lit(True)), "__lh", "left"
    ).withColumn(
        "__drop",
        F.col("__drop").isNotNull()
        & (F.length(F.trim(F.col("line"))) >= min_chars),
    )
    return flagged.groupBy(id_col).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("__drop"),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
        F.sum(F.when(~F.col("__drop"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("__drop"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
    )


# --------------------------------------------------------------------------
# prefix-filtering set-similarity join (AllPairs / PPJoin family)
# --------------------------------------------------------------------------


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    t_num: int,
    t_den: int,
    shingle_k: int = 3,
) -> DataFrame:
    """ALL document pairs with exact shingle Jaccard >= t_num/t_den —
    no blocking columns, no LSH approximation — via prefix filtering
    (Bayardo et al., "Scaling Up All Pairs Similarity Search",
    WWW'07; Xiao et al., PPJoin, WWW'08).

    The theorem: order every document's distinct token set by a global
    token order (rarest-first by corpus frequency). If
    ``J(a, b) >= t`` then ``|a ∩ b| >= ceil(t·|a|)``, so the first
    ``|a| - ceil(t·|a|) + 1`` tokens of ``a`` (its *prefix*) must
    contain at least one shared token. Emitting only prefix tokens as
    join keys therefore loses no qualifying pair, while the frequent
    tokens that make naive token-joins quadratic never leave the
    suffix.  This is the exact counterpart of minhash-LSH: complete
    (recall 1.0 guaranteed, not probabilistic) at the cost of a
    corpus-frequency pass.

    The threshold is the integer fraction ``t_num/t_den`` and the
    verification compares ``inter * t_den >= t_num * uni`` in exact
    integer arithmetic — no float rounding anywhere in the decision.

    Output: (id_a, id_b, inter, uni) BIGINT columns for qualifying
    pairs.

    Scale notes: token frequencies shuffle once on token; per-doc
    prefix extraction is one doc-id ``groupBy`` with
    ``sort_array`` + ``slice`` (no window); candidate generation
    shuffles prefix tokens only — by construction the rarest in each
    document, so join buckets stay small where a naive token join
    explodes; verification joins shingle sets onto the (distinct)
    candidate pairs.

    EVERY join side in this operator scales with the corpus — the
    frequency table is the distinct-shingle vocabulary, the prefix
    table is ~(1−t)·tokens, and the verification sides carry the full
    shingle sets — so none is ever broadcast-able at real scale, and
    each join carries an explicit sort-merge hint. This is deliberate,
    measured, and NOT hand-scheduling what Catalyst gets right:
    Catalyst's size estimator cannot see the explode/groupBy fan-out,
    still estimates these intermediates under the broadcast threshold
    at a 100× corpus, and the resulting corpus-sized broadcast-collect
    dies with TaskResultLost once the heap is pressured (reproduced
    under tools/memory_stress.py: 2 GiB heap, 500k docs — the
    unhinted plan fails at the broadcast stage materialization; the
    hinted plan completes by degrading to sort-spill, the contract a
    1000-executor job needs). Sort-merge rather than shuffle-hash
    because only SMJ is unconditionally spill-safe on the build side.
    """
    # r14: materialize the shingle frame once — it feeds the token
    # stream (frequency + ranked branches) AND both verification sides,
    # and lambda-bearing projections defeat subtree canonicalization:
    # the un-cut plan re-ran the full tokenize+shingle featurization
    # SIX times from the raw scan (plans/r14/dd_prefix_pairs_before).
    sh = truncate_lineage(shingle_frame(df, id_col, text_col, shingle_k))
    toks = sh.select(
        F.col(id_col), F.explode(F.array_distinct(F.col("__sh"))).alias("tok")
    )
    # r15 (guide §2.4): corpus frequency attached via a window count
    # over the token partition instead of a separate aggregate pass +
    # merge join — the join's SMJ sorted the token stream by tok anyway,
    # so the window rides the same exchange+sort while the second
    # explode pass over the shingle RDD and the vocab-count exchange
    # disappear. Same bigint count, same (freq, tok) ordering struct —
    # output bit-identical (verified at sf0.01/sf0.1; interleaved
    # fresh-JVM A/B both orders: 2.93 → 2.76 s median at sf0.1).
    from pyspark.sql import Window

    ranked = toks.withColumn(
        "freq", F.count("*").over(Window.partitionBy("tok"))
    )
    per_doc = ranked.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("freq"), F.col("tok")))
        ).alias("ordered"),
        F.count("*").alias("sz"),
    )
    # prefix length = sz - ceil(t*sz) + 1 ; ceil(a*b/c) = -floordiv(-a*b, c)
    ceil_t_sz = -F.floor((-F.lit(t_num) * F.col("sz")) / F.lit(t_den)).cast("int")
    # r15 (guide §2.3 "shuffle keys, not payloads"): the candidate
    # self-join keys on xxhash64 of the prefix token instead of the
    # token string — fixed 8-byte shuffle keys through the prefix
    # checkpoint and both join exchanges. Output PROVABLY identical,
    # not just collision-unlikely: a hash collision can only ADD a
    # candidate pair (two docs "sharing" a prefix key they don't share
    # as strings), never remove one, and the verification below is the
    # unchanged exact string-shingle arithmetic — a spurious candidate
    # either fails `inter·t_den >= t_num·uni` or is a genuine J >= t
    # pair, which by the prefix theorem already shares a REAL prefix
    # token and was a candidate anyway. Completeness and the emitted
    # integers are untouched. (Interleaved fresh-JVM A/B both orders:
    # 2.75 → 2.59 s median at sf0.1.)
    prefix = per_doc.select(
        F.col(id_col),
        F.col("sz"),
        F.explode(
            F.slice(
                "ordered", 1, (F.col("sz") - ceil_t_sz + F.lit(1)).cast("int")
            )
        ).alias("p"),
    ).select(id_col, "sz", F.xxhash64(F.col("p.tok")).alias("tok"))
    # r14: materialize the prefix table before the self-join — the two
    # sides otherwise each recompute the whole freq+rank+prefix subtree
    # (two more shuffles and a collect_list groupBy EACH). (id, sz,
    # tok) rows only; both sides then scan the same RDD.
    prefix = truncate_lineage(prefix)
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "tok"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "tok"
    )
    cand = (
        a.join(b.hint("merge"), "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        # AllPairs length filter (Bayardo et al. §3): J(a,b) ≤
        # min(|a|,|b|)/max(|a|,|b|), so any pair whose distinct-set
        # sizes differ by more than t_den/t_num can never verify —
        # prune it BEFORE the corpus-side verification joins.
        # Exact integer arithmetic; provably result-identical (only
        # pairs that must fail `inter·t_den >= t_num·uni` are cut).
        .filter(
            F.lit(t_num) * F.greatest("sz_a", "sz_b")
            <= F.lit(t_den) * F.least("sz_a", "sz_b")
        )
        # sz_a/sz_b ride along (functions of the ids — the distinct's
        # pair cardinality is unchanged): the count-based verification
        # below derives uni from them without re-reading the corpus
        .select("id_a", "id_b", "sz_a", "sz_b")
        .distinct()
    )
    # r14 verification refinement (guide §2.3): array_union is gone —
    # __sh is already a DISTINCT set (shingle_frame dedups at build),
    # so uni = sz_a + sz_b − inter by inclusion-exclusion
    # (sz IS the distinct-token count), bit-identical integers at half
    # the per-pair array CPU. (A row-exploded count-based verification
    # was measured and REJECTED: same underlying bytes exploded to one
    # row per token cost +46% at sf0.1 — the set arrays are the
    # compact transport.)
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint")
    uni = (F.col("sz_a") + F.col("sz_b") - inter).cast("bigint")
    return (
        cand.join(sh_a.hint("merge"), "id_a")
        .join(sh_b.hint("merge"), "id_b")
        .select("id_a", "id_b", inter.alias("inter"), uni.alias("uni"))
        .filter(F.col("inter") * F.lit(t_den) >= F.lit(t_num) * F.col("uni"))
    )
