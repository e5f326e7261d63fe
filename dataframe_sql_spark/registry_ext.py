"""Extension catalog entries: dedup, similarity search, text analysis,
multimodal plumbing, streaming-semantics windows (north-star operators
from BASELINE.json — see the operator modules for scale design notes).

Registered into ``registry.CATALOG`` at import. Entries with an
``oracle`` are hash-checked against DuckDB; entries without one are
genuinely non-SQL-expressible (LSH internals, mapInPandas stubs) and
get the driver's rows-only check, with pytest covering semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import (
    annotate_documents,
    bpe_token_estimate,
    fingerprint,
    lang_id,
    token_count,
)
from .multimodal.binary import (
    attach_blob_metadata,
    chunk_audio,
    decode_image_batch,
    sample_video_frames,
)
from .operators.dedup import (
    blocked_ngram_jaccard,
    embedding_dedup,
    exact_dedup,
    hashed_shingle_frame,
    minhash_candidate_pairs,
    minhash_dedup,
    ngram_jaccard_pairs,
    oph_densify_rotation,
    oph_raw_lanes,
    shingle_frame,
    simhash_dedup,
)
from .operators.joins import (
    asof_join,
    best_match_linkage,
    range_join,
    sorted_neighborhood_pairs,
    symmetric_difference,
)
from .operators.packing import pack_sequences
from .operators.sampling import (
    dataset_mix,
    global_shuffle,
    hash_sample,
    hash_split,
    hex_threshold,
    stratified_hash_sample,
)
from .operators.similarity import cosine_topk, ivf_topk, knn_join_ivf, lsh_topk
from .registry import CATALOG, QuerySpec, engine_for
from .streaming.pipeline import (
    dimension_enriched_counts,
    purchase_attribution,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__: list[str] = []

_QUERY_VEC = [1.0] * 64  # constant ANN query (embeddings are 64-dim)
_QUERY_VEC_SQL = "[" + ", ".join("1.0" for _ in range(64)) + "]::DOUBLE[]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine_for(spark, sf_dir).spark.table("documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine_for(spark, sf_dir).spark.table("embeddings")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return engine_for(spark, sf_dir).spark.table("events")


def _reg(
    name: str,
    fn,
    oracle: str | None,
    doc: str,
    oracle_max_sf: float | None = None,
) -> None:
    CATALOG[name] = QuerySpec(
        engine_sql=None, oracle=oracle, fn=fn, doc=doc, oracle_max_sf=oracle_max_sf
    )


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------

_reg(
    "dd_exact",
    lambda spark, sf_dir: exact_dedup(_docs(spark, sf_dir), ["text"], "doc_id"),
    "SELECT * FROM documents WHERE doc_id IN "
    "(SELECT min(doc_id) FROM documents GROUP BY text)",
    "exact dedup: one survivor (min id) per distinct text, hash-keyed shuffle",
)

_reg(
    "dd_exact_normalized",
    # Normalize-then-dedup: survivors keyed on the NORMALIZED-text
    # fingerprint (lower + trim + whitespace collapse, md5'd to a
    # fixed-width shuffle key) — catches the case/whitespace variants
    # raw exact dedup misses, the standard first pass before near-dup.
    # Same min-id survivor policy as dd_exact.
    lambda spark, sf_dir: exact_dedup(
        _docs(spark, sf_dir).withColumn("__fp", fingerprint(F.col("text"))),
        ["__fp"],
        "doc_id",
    ).select("doc_id", "lang", "source"),
    r"SELECT doc_id, lang, source FROM documents WHERE doc_id IN "
    r"(SELECT min(doc_id) FROM documents GROUP BY "
    r"md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')))",
    "normalize-then-dedup: min-id survivor per normalized-text "
    "fingerprint (case/whitespace variants collapse; fixed-width "
    "md5 shuffle key)",
)

_reg(
    "dd_fingerprint",
    lambda spark, sf_dir: _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    ),
    r"SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp "
    "FROM documents",
    "md5 fingerprint of normalized text — cross-engine-stable dedup key",
)

_reg(
    "dd_minhash",
    lambda spark, sf_dir: minhash_dedup(
        _docs(spark, sf_dir), "doc_id", "text", threshold=0.7
    ).select("doc_id", "lang", "source", "n_chars"),
    None,  # LSH internals (xxhash band buckets) aren't SQL-expressible
    "minhash-LSH near-dup removal, greedy min-id survivors; pytest checks semantics",
)

_reg(
    "dd_minhash_pairs",
    lambda spark, sf_dir: ngram_jaccard_pairs(
        _docs(spark, sf_dir),
        minhash_candidate_pairs(_docs(spark, sf_dir), "doc_id", "text"),
        "doc_id",
        "text",
        threshold=0.5,
        hashed=True,
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")),
    None,
    "LSH candidate pairs verified by exact shingle Jaccard ≥ 0.5",
)

_reg(
    "dd_ngram_jaccard",
    lambda spark, sf_dir: blocked_ngram_jaccard(
        _docs(spark, sf_dir), "doc_id", "text", ["lang", "source"]
    ).select(
        "id_a",
        "id_b",
        F.col("inter").cast("bigint").alias("inter"),
        F.col("uni").cast("bigint").alias("uni"),
    ),
    r"WITH w AS ("
    r" SELECT doc_id, lang, source,"
    r"  string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents), "
    r"sh AS ("
    r" SELECT doc_id, lang, source,"
    r"  list_transform(range(1, greatest(len(ws) - 2, 1) + 1),"
    r"   i -> array_to_string(ws[i:i+2], ' ')) AS s FROM w) "
    r"SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    r" len(list_intersect(a.s, b.s))::BIGINT AS inter,"
    r" len(list_distinct(list_cat(a.s, b.s)))::BIGINT AS uni "
    r"FROM sh a JOIN sh b"
    r" ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id",
    "exact blocked n-gram Jaccard (integer set sizes — rounding-proof "
    "differential check over every in-block pair)",
)

def _dd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph import cluster_representatives

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs,
        minhash_candidate_pairs(docs, "doc_id", "text"),
        "doc_id",
        "text",
        threshold=0.5,
        hashed=True,
    ).select("id_a", "id_b")
    return cluster_representatives(docs, pairs, "doc_id").select(
        "doc_id", "lang", "source"
    )


_reg(
    "dd_clusters",
    _dd_clusters,
    None,  # iterative connected components — not SQL-expressible; pytest-gated
    "transitive near-dup clustering: minhash pairs → connected components → "
    "min-id survivor per cluster (closes A~B~C chains pairwise dedup misses)",
)

def _shingle_sharing_candidates(docs: DataFrame) -> DataFrame:
    """Complete shingle-sharing candidate superset (id_a < id_b): a
    pair with any word-shingle Jaccard > 0 must share a shingle, so
    every positive pair is a candidate. CERTIFICATE-ONLY generator —
    quadratic in shingle document frequency; the production path is
    LSH banding. Shared by the clusters/estimation/triangle/fuzzy
    certificates so the construction cannot drift between them.
    """
    ex = (
        shingle_frame(docs, "doc_id", "text")
        .select("doc_id", F.explode("__sh").alias("g"))
        .distinct()
    )
    return (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def _verified_edges(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard >= threshold edges over the complete candidate
    superset — the oracle-able edge set for the graph certificates."""
    return ngram_jaccard_pairs(
        docs, _shingle_sharing_candidates(docs), "doc_id", "text", threshold=threshold
    ).select("id_a", "id_b")


# Shared DuckDB CTE text: word-shingle (k=3) lists per doc, identical to
# the dd_ngram_jaccard oracle's formulation (which hash-matches the Spark
# shingle_frame path).
_SH_CTE = (
    r"w AS (SELECT doc_id, lang, source,"
    r" string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents), "
    r"sh AS (SELECT doc_id, lang, source,"
    r" list_transform(range(1, greatest(len(ws) - 2, 1) + 1),"
    r"  i -> array_to_string(ws[i:i+2], ' ')) AS s FROM w)"
)

_reg(
    "dd_minhash_verified",
    # LSH-family CERTIFICATE (hash-checkable, unlike dd_minhash itself):
    # the claim "banded OPH minhash finds every pair with exact Jaccard
    # >= 0.8" is checked end-to-end — Spark runs the real LSH pipeline
    # (signatures -> bands -> buckets -> candidate pairs) then verifies
    # candidates with exact shingle Jaccard; DuckDB independently computes
    # exact Jaccard over the complete shingle-sharing candidate superset
    # (a pair with J > 0 must share a shingle, so the superset is lossless).
    # A hash match therefore proves LSH recall = 1.0 at J >= 0.8 on this
    # corpus (16 bands x 4 rows: miss probability (1-0.8^4)^16 ~ 2e-4 per
    # pair). Integer inter/uni sizes keep the check rounding-proof.
    lambda spark, sf_dir: ngram_jaccard_pairs(
        _docs(spark, sf_dir),
        minhash_candidate_pairs(_docs(spark, sf_dir), "doc_id", "text"),
        "doc_id",
        "text",
        threshold=0.8,
    )
    .join(
        shingle_frame(_docs(spark, sf_dir), "doc_id", "text").select(
            F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a")
        ),
        "id_a",
    )
    .join(
        shingle_frame(_docs(spark, sf_dir), "doc_id", "text").select(
            F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b")
        ),
        "id_b",
    )
    .select(
        "id_a",
        "id_b",
        F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("inter"),
        F.size(F.array_union("sh_a", "sh_b")).cast("bigint").alias("uni"),
    ),
    f"WITH {_SH_CTE}, "
    r"ex AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh), "
    r"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
    r" FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id) "
    r"SELECT c.id_a, c.id_b,"
    r" len(list_intersect(x.s, y.s))::BIGINT AS inter,"
    r" len(list_distinct(list_cat(x.s, y.s)))::BIGINT AS uni "
    r"FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b "
    r"WHERE len(list_intersect(x.s, y.s))::DOUBLE"
    r" / len(list_distinct(list_cat(x.s, y.s))) >= 0.8",
    "minhash-LSH recall certificate: LSH candidates verified by exact "
    "Jaccard >= 0.8 must equal ALL such pairs (DuckDB recomputes over the "
    "shingle-sharing superset)",
    oracle_max_sf=0.01,  # complete-pair-set oracle is quadratic by design
)


def _dd_clusters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components CERTIFICATE: run the real iterative label
    propagation (operators/graph.py) over an oracle-able edge set — the
    exact n-gram Jaccard >= 0.5 pairs from the complete shingle-sharing
    candidate superset — and emit every touched node with its cluster
    label (min reachable id). DuckDB independently computes the same
    closure with a recursive transitive-closure CTE, so a hash match
    certifies the iterative algorithm's fixpoint, which dd_clusters
    (LSH-edged, rows-only) cannot get.

    The shingle-sharing self-join is the certificate-only candidate
    generator (exact, but quadratic in shingle document frequency); the
    production path at scale is LSH banding (``dd_clusters``), whose
    recall this entry plus ``dd_minhash_verified`` pin down.
    """
    from .operators.graph import connected_components

    edges = _verified_edges(_docs(spark, sf_dir), threshold=0.5)
    return connected_components(edges).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


_reg(
    "dd_clusters_verified",
    _dd_clusters_verified,
    f"WITH RECURSIVE {_SH_CTE}, "
    r"ex AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh), "
    r"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
    r" FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id), "
    r"e AS (SELECT c.id_a, c.id_b"
    r" FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b"
    r" WHERE len(list_intersect(x.s, y.s))::DOUBLE"
    r"  / len(list_distinct(list_cat(x.s, y.s))) >= 0.5), "
    r"sym AS (SELECT id_a AS s, id_b AS d FROM e"
    r" UNION SELECT id_b, id_a FROM e), "
    r"reach(s, d) AS ("
    r" SELECT DISTINCT s, s FROM sym"
    r" UNION"
    r" SELECT r.s, y.d FROM reach r JOIN sym y ON r.d = y.s) "
    r"SELECT s AS doc_id, min(d) AS cluster_id FROM reach GROUP BY s",
    "transitive-closure certificate: iterative min-label propagation over "
    "exact Jaccard >= 0.5 edges (complete shingle-sharing candidates) vs "
    "a DuckDB recursive-CTE closure",
    oracle_max_sf=0.01,  # recursive-closure oracle infeasible beyond sf0.01
)

_reg(
    "dd_simhash",
    # Default config: probe_bits=0, one 4-chunk pigeonhole key set per
    # doc, complete for hamming <= 3. This is simhash's actual niche —
    # the memory-/shuffle-constrained regime where one 8-byte
    # signature per doc must suffice (banded minhash beats it on both
    # recall and cost when signatures can be wider; see SCALE.md).
    lambda spark, sf_dir: simhash_dedup(
        _docs(spark, sf_dir), "doc_id", "text", max_hamming=3
    ).select("doc_id", "lang", "source"),
    None,
    "simhash near-dup removal (64-bit, pigeonhole chunk blocking, "
    "complete for hamming ≤ 3 — the one-key-per-doc niche config)",
)

_reg(
    "dd_simhash_probed",
    # probe_bits=1 extends the complete radius from 3 to 7 (1-bit
    # multi-probe per 16-bit chunk) at ×17 bucket-key volume —
    # measured 19/25 -> 22/25 of exact J>=0.8 pairs on this corpus;
    # the last 3 sit at hamming 8-10, beyond any practical simhash
    # radius (featurization limit). Tracked as a separate bench key so
    # the recall/cost trade is explicit round-over-round.
    lambda spark, sf_dir: simhash_dedup(
        _docs(spark, sf_dir), "doc_id", "text", max_hamming=7, probe_bits=1
    ).select("doc_id", "lang", "source"),
    None,
    "simhash near-dup removal (64-bit, 1-bit multi-probed pigeonhole "
    "blocking, complete for hamming ≤ 7 — the high-recall config)",
)

_reg(
    "dd_embedding",
    lambda spark, sf_dir: embedding_dedup(
        _emb(spark, sf_dir), "vec_id", "embedding", block_col="label", threshold=0.99
    ).select("vec_id", "label"),
    "SELECT vec_id, label FROM embeddings WHERE vec_id NOT IN ("
    " SELECT b.vec_id FROM embeddings a JOIN embeddings b"
    "  ON a.label = b.label AND a.vec_id < b.vec_id"
    " WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.99)",
    "embedding cosine near-dup (≥0.99) blocked by label, greedy min-id survivors",
)

# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_reg(
    "sim_topk",
    lambda spark, sf_dir: cosine_topk(
        _emb(spark, sf_dir), "embedding", _QUERY_VEC, k=10
    ).select("vec_id", F.round("score", 8).alias("score")),
    "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], "
    f"{_QUERY_VEC_SQL}), 8) AS score "
    "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
    "exact brute-force cosine top-k (TakeOrderedAndProject, no shuffle)",
)

_reg(
    "sim_knn_join",
    # cell-keyed kNN join (knn_join_ivf): candidates come from an IVF
    # cell EQUI-join, never a cartesian product — the plan here is the
    # 100-TB plan (the brute-force all-pairs form stays available as
    # similarity.py::knn_join_bruteforce for pytest baselines). Full
    # probe (n_probe == n_cells) is provably exact, so the brute-force
    # DuckDB oracle below certifies it; partial-probe recall is
    # pytest-gated (test_operators.py::test_knn_join_ivf_partial_probe).
    lambda spark, sf_dir: knn_join_ivf(
        _emb(spark, sf_dir).filter(F.col("label") == 0).select(
            F.col("vec_id").alias("id_a"), "embedding"
        ),
        _emb(spark, sf_dir).filter(F.col("label") != 0).select(
            F.col("vec_id").alias("id_b"), "embedding"
        ),
        k=3,
        n_cells=16,
    ).select("id_a", "id_b", F.round("score", 8).alias("score")),
    "SELECT id_a, id_b, score FROM ("
    " SELECT a.vec_id AS id_a, b.vec_id AS id_b,"
    "  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 8)"
    "   AS score,"
    "  row_number() OVER (PARTITION BY a.vec_id ORDER BY"
    "   list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,"
    "   b.vec_id) AS rn"
    " FROM embeddings a JOIN embeddings b ON b.label != 0"
    " WHERE a.label = 0) t WHERE rn <= 3",
    "k-NN join: 3 nearest corpus vectors per query vector via the IVF "
    "cell-keyed equi-join (exact at full probe; no cartesian product)",
)

_reg(
    "sim_knn_join_probed",
    # PARTIAL-probe IVF kNN join, fully oracle-replayed: because the
    # centroid pick is deterministic (the 16 right vectors with
    # smallest md5(id) — _ivf_centroids), the ENTIRE approximate
    # algorithm is SQL-expressible: DuckDB re-derives the same
    # centroids, the same nearest-cell assignment (argmax cosine ==
    # argmax dot-with-normalized-centroid for a fixed vector; ties →
    # lowest cell), the same 4-of-16 probed cells per query, the same
    # cell equi-join candidates, and the same top-3 — so the hash
    # match certifies the approximate path ITSELF, not just its
    # full-probe degenerate. This closes the gap where partial-probe
    # behavior was only pytest-gated.
    lambda spark, sf_dir: knn_join_ivf(
        _emb(spark, sf_dir).filter(F.col("label") == 0).select(
            F.col("vec_id").alias("id_a"), "embedding"
        ),
        _emb(spark, sf_dir).filter(F.col("label") != 0).select(
            F.col("vec_id").alias("id_b"), "embedding"
        ),
        k=3,
        n_cells=16,
        n_probe=4,
    ).select("id_a", "id_b", F.round("score", 8).alias("score")),
    "WITH r AS (SELECT vec_id AS id_b, embedding::DOUBLE[] AS v"
    " FROM embeddings WHERE label != 0), "
    "l AS (SELECT vec_id AS id_a, embedding::DOUBLE[] AS v"
    " FROM embeddings WHERE label = 0), "
    "cents AS (SELECT row_number() OVER (ORDER BY md5(CAST(id_b AS VARCHAR)))"
    " - 1 AS cell, v FROM (SELECT id_b, v FROM r"
    " ORDER BY md5(CAST(id_b AS VARCHAR)) LIMIT 16)), "
    "rs AS (SELECT id_b, v, cell FROM ("
    " SELECT r.id_b, r.v, c.cell, row_number() OVER (PARTITION BY r.id_b"
    "  ORDER BY round(list_cosine_similarity(r.v, c.v), 8) DESC, c.cell) AS rn"
    " FROM r CROSS JOIN cents c) WHERE rn = 1), "
    "lp AS (SELECT id_a, v, cell FROM ("
    " SELECT l.id_a, l.v, c.cell, row_number() OVER (PARTITION BY l.id_a"
    "  ORDER BY round(list_cosine_similarity(l.v, c.v), 8) DESC, c.cell) AS rn"
    " FROM l CROSS JOIN cents c) WHERE rn <= 4), "
    "cand AS (SELECT lp.id_a, rs.id_b, list_cosine_similarity(lp.v, rs.v) AS s"
    " FROM lp JOIN rs ON lp.cell = rs.cell) "
    "SELECT id_a, id_b, round(s, 8) AS score FROM ("
    " SELECT id_a, id_b, s, row_number() OVER (PARTITION BY id_a"
    "  ORDER BY s DESC, id_b) AS rn FROM cand) WHERE rn <= 3",
    "partial-probe (4/16 cells) IVF kNN join with the FULL approximate "
    "algorithm replayed in the oracle (deterministic centroids make "
    "assignment/probe/candidates SQL-expressible) — certifies the "
    "approximate path itself",
)

_reg(
    "sim_ann_ivf",
    lambda spark, sf_dir: ivf_topk(
        _emb(spark, sf_dir), "embedding", _QUERY_VEC, k=10, n_cells=16, n_probe=16
    ).select("vec_id", F.round("score", 8).alias("score")),
    # full probe (n_probe == n_cells) is provably exact ⇒ same oracle as sim_topk;
    # partial-probe recall is pytest-gated (test_operators.py)
    "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], "
    f"{_QUERY_VEC_SQL}), 8) AS score "
    "FROM embeddings ORDER BY score DESC, vec_id LIMIT 10",
    "IVF coarse-quantized ANN: probe nearest centroid cells, exact rerank inside",
)

_reg(
    "sim_ann_ivf_probed",
    # Partial-probe IVF top-k with the approximate algorithm replayed
    # in the oracle (same construction as sim_knn_join_probed: the
    # md5-deterministic centroid pick makes assignment + probe
    # SQL-expressible). The probe-cell ranking for a CONSTANT query is
    # computed driver-side in Python (ivf_topk) and in SQL by DuckDB —
    # both argmax cosine with lowest-cell tiebreak.
    lambda spark, sf_dir: ivf_topk(
        _emb(spark, sf_dir), "embedding", _QUERY_VEC, k=10, n_cells=16, n_probe=4
    ).select("vec_id", F.round("score", 8).alias("score")),
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "cents AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)))"
    " - 1 AS cell, v FROM (SELECT vec_id, v FROM e"
    " ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16)), "
    "assigned AS (SELECT vec_id, v, cell FROM ("
    " SELECT e.vec_id, e.v, c.cell, row_number() OVER (PARTITION BY e.vec_id"
    "  ORDER BY round(list_cosine_similarity(e.v, c.v), 8) DESC, c.cell) AS rn"
    " FROM e CROSS JOIN cents c) WHERE rn = 1), "
    "probe AS (SELECT cell FROM ("
    f" SELECT cell, row_number() OVER (ORDER BY"
    f"  round(list_cosine_similarity(v, {_QUERY_VEC_SQL}), 8) DESC, cell) AS rn"
    " FROM cents) WHERE rn <= 4) "
    "SELECT vec_id, round(list_cosine_similarity(v, "
    f"{_QUERY_VEC_SQL}), 8) AS score "
    "FROM assigned WHERE cell IN (SELECT cell FROM probe) "
    "ORDER BY list_cosine_similarity(v, "
    f"{_QUERY_VEC_SQL}) DESC, vec_id LIMIT 10",
    "partial-probe (4/16) IVF ANN top-k with the approximate algorithm "
    "replayed in the oracle — certifies cell pick, assignment, and "
    "in-cell rerank, not just the full-probe degenerate",
)

_reg(
    "sim_ann_lsh",
    lambda spark, sf_dir: lsh_topk(
        _emb(spark, sf_dir), "embedding", _QUERY_VEC, k=10, num_bits=16, rerank=100
    ).select("vec_id", F.round("score", 8).alias("score")),
    None,  # hyperplane signatures not SQL-expressible; pytest checks recall vs exact
    "approximate top-k via random-hyperplane LSH + exact rerank",
)


def _sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivfpq_topk, pq_topk

    return pq_topk(
        _emb(spark, sf_dir), "embedding", _QUERY_VEC, k=10, n_sub=8, n_codes=16,
        rerank=100,
    ).select("vec_id", F.round("score", 8).alias("score"))


_reg(
    "sim_ann_pq",
    _sim_pq,
    None,  # codebook training is not SQL-expressible; pytest gates recall
    "product-quantization ANN: 8x16 codebooks (k-means on a bounded "
    "deterministic sample), ADC scan over literal lookup tables, exact "
    "rerank - the compressed-index scale path (n_sub bytes/vector)",
)


def _sim_recall_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall CERTIFICATE — driver-scoreable property check for the
    approximate methods whose internals aren't SQL-expressible. Each
    method's full pipeline (signatures/cells/codebooks → prune →
    rerank) runs for real; recall@10 against the exact brute-force
    top-k is computed Spark-side and compared to a floor the method is
    measured to clear on this corpus (sf0.001 AND sf0.01, deterministic
    planes/centroids/codebooks). The DuckDB oracle pins every flag to
    true, so a driver hash match certifies the bounds actually held —
    upgrading what used to be pytest-only gates into scored rows.
    """
    from .operators.similarity import ivfpq_topk, pq_topk

    emb = _emb(spark, sf_dir)
    exact = cosine_topk(emb, "embedding", _QUERY_VEC, k=10).select("vec_id")
    exact = exact.persist()
    try:
        def recall(approx: DataFrame) -> float:
            return approx.select("vec_id").join(exact, "vec_id").count() / 10.0

        rows = [
            (
                "ivf_probe4",
                recall(
                    ivf_topk(emb, "embedding", _QUERY_VEC, k=10, n_cells=16, n_probe=4)
                ),
                0.4,
            ),
            (
                "lsh_32bit_rerank300",
                recall(
                    lsh_topk(
                        emb, "embedding", _QUERY_VEC, k=10, num_bits=32, rerank=300
                    )
                ),
                0.8,
            ),
            (
                "pq_8x16_rerank100",
                recall(
                    pq_topk(
                        emb, "embedding", _QUERY_VEC, k=10, n_sub=8, n_codes=16,
                        rerank=100,
                    )
                ),
                0.6,
            ),
            (
                # rerank is generous relative to this corpus because the
                # synthetic embeddings are near-uniform: ADC discrimination
                # tracks cluster structure, and on unclustered noise the
                # approximate ranking of ~equidistant vectors is noisy.
                # Deterministic measured recall: 1.0 at sf0.001, 0.9 at
                # sf0.01 (no RNG anywhere — recall is fixed per corpus).
                "ivfpq_fullprobe_rerank300",
                recall(
                    ivfpq_topk(
                        emb, "embedding", _QUERY_VEC, k=10, n_cells=8,
                        n_probe=8, rerank=300,
                    )
                ),
                0.8,
            ),
        ]
    finally:
        exact.unpersist()
    return spark.createDataFrame(
        [(m, r >= t) for m, r, t in rows], "method string, recall_ok boolean"
    )


_reg(
    "sim_ann_recall_cert",
    _sim_recall_cert,
    "SELECT * FROM (VALUES ('ivf_probe4', true), ('lsh_32bit_rerank300', true), "
    "('pq_8x16_rerank100', true), ('ivfpq_fullprobe_rerank300', true)) t(method, recall_ok)",
    "recall certificates for IVF/LSH/PQ/IVF-PQ ANN: measured recall@10 vs exact "
    "brute force must clear per-method floors (oracle pins the flags)",
)

# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------

_reg(
    "txt_stats",
    lambda spark, sf_dir: _docs(spark, sf_dir).select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_token_estimate(F.col("text")).alias("n_bpe"),
        F.length(F.trim(F.col("text"))).cast("bigint").alias("n_chars2"),
    ),
    r"SELECT doc_id, "
    r"CASE WHEN length(trim(text)) = 0 THEN 0 "
    r"ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens, "
    r"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
    r"greatest(length(string_split_regex(trim(text), '\s+')), "
    r"ceil(length(text) / 4.0)::INT) "
    r"+ length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) END::BIGINT AS n_bpe, "
    r"length(trim(text))::BIGINT AS n_chars2 FROM documents",
    "token counting: whitespace tokens + BPE-ish estimate",
)

_reg(
    "txt_langid",
    lambda spark, sf_dir: _docs(spark, sf_dir).select(
        "doc_id", "lang", lang_id(F.col("text")).alias("lang_pred")
    ),
    None,  # per-language stopword-hit argmax: expressible but brittle in SQL;
    # pytest checks accuracy on crafted sentences, txt_langid_golden is the
    # driver-scoreable version. (The synthetic corpus's lang column is a
    # decorative label — all its text is English-ish word salad — so a
    # label-accuracy certificate would be meaningless here.)
    "n-gram/stopword-heuristic language ID over {en,de,fr,es}",
)

_LANGID_GOLDEN = [
    (1, "the cat and the dog is in a house for it", "en"),
    (2, "der hund und die katze ist nicht ein tier mit einem haus auf dem weg zu dir", "de"),
    (3, "le chien et la vache est dans une maison pour un garcon de paris", "fr"),
    (4, "el perro y los gatos es una casa para el hombre en madrid", "es"),
    (5, "zzz qqq xxx yyy", "und"),
]

_reg(
    "txt_langid_golden",
    # Golden-text CERTIFICATE: fixed multilingual sentences constructed
    # inline (the sf tables can't serve — see txt_langid note), predicted
    # by the real stopword-argmax expression; the DuckDB oracle pins the
    # expected labels, making language-ID behavior a driver-scored row.
    lambda spark, sf_dir: spark.createDataFrame(
        [(i, t) for i, t, _ in _LANGID_GOLDEN], "sid int, text string"
    ).select("sid", lang_id(F.col("text")).alias("lang_pred")),
    "SELECT * FROM (VALUES "
    + ", ".join(f"({i}, '{lang}')" for i, _, lang in _LANGID_GOLDEN)
    + ") t(sid, lang_pred)",
    "language-ID golden certificate: known en/de/fr/es/und sentences "
    "must classify correctly (oracle pins the expected labels)",
)

_reg(
    "txt_quality",
    lambda spark, sf_dir: _docs(spark, sf_dir).select(
        "doc_id",
        F.round(
            F.length(F.regexp_replace(F.trim(F.col("text")), r"[A-Za-z0-9\s]", "")).cast(
                "double"
            )
            / F.length(F.trim(F.col("text"))),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.length(F.trim(F.col("text"))).cast("double")
            / F.size(F.split(F.trim(F.col("text")), r"\s+")),
            6,
        ).alias("mean_word_len"),
    ),
    r"SELECT doc_id, "
    r"round(length(regexp_replace(trim(text), '[A-Za-z0-9\s]', '', 'g'))::DOUBLE "
    r"/ length(trim(text)), 6) AS punct_ratio, "
    r"round(length(trim(text))::DOUBLE "
    r"/ length(string_split_regex(trim(text), '\s+')), 6) AS mean_word_len "
    r"FROM documents",
    "quality signals: punctuation ratio, mean word length",
)

def _txt_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import repetition_features_frame

    return repetition_features_frame(_docs(spark, sf_dir), ["doc_id"], "text")


_reg(
    "txt_repetition",
    _txt_repetition,
    # Independent formulation on purpose: Spark computes the signals
    # map-side over per-row arrays; the oracle explodes tokens and uses
    # grouped counts + gaps-and-islands windows. Agreement checks both.
    r"WITH lists AS (SELECT doc_id, "
    r"string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents), "
    r"toks AS (SELECT doc_id, unnest(ws) AS w, "
    r"unnest(generate_series(1, len(ws))) AS pos FROM lists), "
    r"wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w), "
    r"perdoc AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, "
    r"max(c) AS top_word FROM wc GROUP BY doc_id), "
    r"big AS (SELECT doc_id, w || ' ' || lead(w) OVER "
    r"(PARTITION BY doc_id ORDER BY pos) AS bg FROM toks), "
    r"bgc AS (SELECT doc_id, bg, count(*) AS c FROM big "
    r"WHERE bg IS NOT NULL GROUP BY doc_id, bg), "
    r"bgd AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram "
    r"FROM bgc GROUP BY doc_id), "
    r"runs AS (SELECT doc_id, pos, CASE WHEN lag(w) OVER "
    r"(PARTITION BY doc_id ORDER BY pos) = w THEN 0 ELSE 1 END AS brk FROM toks), "
    r"runs2 AS (SELECT doc_id, sum(brk) OVER "
    r"(PARTITION BY doc_id ORDER BY pos) AS rid FROM runs), "
    r"runlen AS (SELECT doc_id, rid, count(*) AS c FROM runs2 "
    r"GROUP BY doc_id, rid), "
    r"mr AS (SELECT doc_id, max(c) AS max_run FROM runlen GROUP BY doc_id) "
    r"SELECT p.doc_id, p.n_words::BIGINT AS n_words, "
    r"(p.n_words - p.n_distinct)::DOUBLE / p.n_words AS dup_word_ratio, "
    r"p.top_word::DOUBLE / p.n_words AS top_word_ratio, "
    r"coalesce(b.top_bigram::DOUBLE / b.n_bigrams, 0.0) AS top_bigram_ratio, "
    r"m.max_run::BIGINT AS max_run "
    r"FROM perdoc p LEFT JOIN bgd b USING (doc_id) JOIN mr m USING (doc_id)",
    "Gopher-style repetition filters: dup-word / top-word / top-bigram "
    "shares and longest same-word run, all map-side array aggregates "
    "(zero shuffle; oracle uses the explode/window shape)",
)


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------


def _mm_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to binary stands in for media blobs."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )


_reg(
    "mm_blob_meta",
    lambda spark, sf_dir: attach_blob_metadata(_mm_blobs(spark, sf_dir), "blob").select(
        "doc_id",
        F.col("blob_meta.byte_length").alias("byte_length"),
        F.col("blob_meta.content_hash").alias("content_hash"),
        F.col("blob_meta.media_type").alias("media_type"),
    ),
    "SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_length, "
    "md5(text) AS content_hash, 'application/octet-stream' AS media_type "
    "FROM documents",
    "binary-column metadata: length, content hash, magic-byte type sniff",
)

_reg(
    "mm_audio_chunks",
    lambda spark, sf_dir: chunk_audio(
        _mm_blobs(spark, sf_dir), "blob", chunk_seconds=1.0, bytes_per_second=256, fake=True
    ).select("doc_id", "chunk_idx", "chunk_start_s", F.length("chunk_blob").alias("n_bytes")),
    "WITH c AS (SELECT doc_id, octet_length(encode(text)) AS n, "
    " greatest((octet_length(encode(text)) + 255) // 256, 1) AS nchunks FROM documents), "
    "u AS (SELECT doc_id, n, unnest(generate_series(1, nchunks)) AS i FROM c) "
    "SELECT doc_id, (i - 1)::INT AS chunk_idx, ((i - 1) * 1.0)::DOUBLE AS chunk_start_s, "
    " least(256, n - (i - 1) * 256)::INT AS n_bytes FROM u",
    "audio chunking fan-out (mapInPandas explode; stub PCM slicing) — "
    "chunk boundaries oracle-checked",
)

_reg(
    "mm_video_frames",
    lambda spark, sf_dir: sample_video_frames(
        _mm_blobs(spark, sf_dir), "blob", every_n_bytes=1024, max_frames=8, fake=True
    ).select("doc_id", "frame_idx", F.length("frame_blob").alias("n_bytes")),
    "WITH c AS (SELECT doc_id, octet_length(encode(text)) AS n, "
    "least(greatest(octet_length(encode(text)) // 1024, 1), 8) AS nframes "
    "FROM documents), "
    "u AS (SELECT doc_id, n, unnest(generate_series(1, nframes)) AS i FROM c) "
    "SELECT doc_id, (i - 1)::INT AS frame_idx, "
    "least(1024, greatest(n - (i - 1) * 1024, 0))::INT AS n_bytes FROM u",
    "video frame-sampling fan-out (mapInPandas explode, <=8 frames/blob; "
    "stub byte-window sampling) - frame boundaries oracle-checked",
)

_reg(
    "mm_decode_stub",
    lambda spark, sf_dir: decode_image_batch(
        _mm_blobs(spark, sf_dir), "blob", fake=True
    ).select("doc_id", "width", "height", "channels"),
    None,  # mapInPandas stub; decode is deterministic-fake (no codecs in container)
    "Arrow-batched mapInPandas decode pipeline (deterministic stub decode)",
)

# --------------------------------------------------------------------------
# streaming-semantics windows (batch-checkable; readStream path in tests)
# --------------------------------------------------------------------------


def _tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tumbling_counts(_events(spark, sf_dir), "1 hour")
    return out.select(
        "wstart",
        "event_type",
        "n",
        F.round(F.col("sum_value"), 4).alias("sum_value"),
    )


_reg(
    "st_tumbling",
    _tumbling,
    "SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type, "
    "count(*) AS n, round(sum(value), 4) AS sum_value "
    "FROM events GROUP BY 1, 2",
    "tumbling 1h event-time windows (streaming-identical semantics, batch-checked)",
)

_reg(
    "st_sliding",
    lambda spark, sf_dir: sliding_counts(_events(spark, sf_dir), "1 hour", "30 minutes"),
    "WITH s AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, event_type "
    "FROM events), w AS ("
    "SELECT b AS wstart, event_type FROM s UNION ALL "
    "SELECT b - INTERVAL '30 minutes' AS wstart, event_type FROM s) "
    "SELECT wstart, event_type, count(*) AS n FROM w GROUP BY 1, 2",
    "sliding 1h/30m windows (each event in 2 windows)",
)

_reg(
    "st_session",
    lambda spark, sf_dir: session_counts(_events(spark, sf_dir), "30 minutes"),
    "WITH o AS (SELECT user_id, ts, lag(ts) OVER "
    "(PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
    "m AS (SELECT user_id, ts, CASE WHEN prev IS NULL "
    "OR ts - prev >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s FROM o), "
    "g AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM m) "
    "SELECT min(ts) AS session_start, user_id, count(*) AS n_events "
    "FROM g GROUP BY user_id, sid",
    "session windows (30 min gap) — gaps-and-islands oracle",
)


def _st_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = engine_for(spark, sf_dir)
    return dimension_enriched_counts(
        eng.spark.table("events"), eng.spark.table("customer")
    ).orderBy("segment", "event_type")


_reg(
    "st_static_join",
    _st_static_join,
    "SELECT c_mktsegment AS segment, event_type, count(*) AS n, "
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM events JOIN customer ON user_id = c_custkey "
    "GROUP BY 1, 2 ORDER BY 1, 2",
    "stream-static dimension enrichment (broadcast dim join + per-"
    "segment aggregate; identical code runs on readStream — batch≡"
    "stream gate in test_streaming)",
)

# --------------------------------------------------------------------------
# joins beyond the reference (SURVEY §2.4 J8) + reference-compat setop
# --------------------------------------------------------------------------


def _asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    return asof_join(clicks, purchases, on="ts", by="user_id").select(
        "event_id", "user_id", "purchase_value"
    )


_reg(
    "j_asof",
    _asof,
    "SELECT l.event_id, l.user_id, r.value AS purchase_value "
    "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l "
    "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events "
    "WHERE event_type = 'purchase') r "
    "ON l.user_id = r.user_id AND l.ts >= r.ts",
    "J8 as-of join (union-window pattern, one shuffle) vs DuckDB ASOF JOIN",
)


def _reg_sql(name: str, engine_sql: str, oracle: str | None, doc: str) -> None:
    CATALOG[name] = QuerySpec(engine_sql=engine_sql, oracle=oracle or engine_sql, doc=doc)


_reg_sql(
    "q_recursive_cte",
    "WITH RECURSIVE m(n) AS ("
    " SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12) "
    "SELECT n, count(o_orderkey) AS n_orders "
    "FROM m LEFT JOIN orders ON month(o_orderdate) = n GROUP BY n",
    None,  # identical SQL runs on DuckDB
    "recursive CTE (iterative expansion joined against a table; "
    "Q3 extension beyond the reference grammar)",
)

_reg_sql(
    "j_semi",
    "select c_custkey, c_name from customer left semi join orders "
    "on c_custkey = o_custkey",
    "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "J8 semi join (extension; absent from reference grammar)",
)
_reg_sql(
    "j_anti",
    "select c_custkey, c_name from customer left anti join orders "
    "on c_custkey = o_custkey",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "J8 anti join (extension)",
)


def _symdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = engine_for(spark, sf_dir)
    a = eng.query("select l_orderkey as k from lineitem where l_quantity > 49")
    b = eng.query("select o_orderkey as k from orders where o_totalprice > 300000")
    return symmetric_difference(a, b)


_reg(
    "u_symdiff",
    _symdiff,
    "SELECT k FROM ((SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 49 "
    "EXCEPT SELECT o_orderkey FROM orders WHERE o_totalprice > 300000) "
    "UNION "
    "(SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 300000 "
    "EXCEPT SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)) t",
    "reference-compat EXCEPT (symmetric difference — the reference oracle's "
    "actual semantics, tests :602-614); engine EXCEPT stays ANSI",
)

# --------------------------------------------------------------------------
# pivot / unpivot
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_reg(
    "x_pivot",
    lambda spark, sf_dir: _events(spark, sf_dir)
    .groupBy("user_id")
    .pivot("event_type", _EVENT_TYPES)
    .count()
    .na.fill(0, _EVENT_TYPES),
    "SELECT user_id, "
    + ", ".join(
        f"count(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
    "pivot: per-user event_type counts (explicit value list → stable schema)",
)

_reg(
    "x_unpivot",
    lambda spark, sf_dir: engine_for(spark, sf_dir)
    .spark.table("lineitem")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    .unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice"],
        "metric",
        "val",
    ),
    "SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val "
    "FROM lineitem UNION ALL "
    "SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric, l_extendedprice "
    "FROM lineitem",
    "unpivot/melt to long format",
)

# --------------------------------------------------------------------------
# scalar function surface (extension; reference has none, SURVEY §2.3)
# --------------------------------------------------------------------------

_reg_sql(
    "f_string_funcs",
    "select o_orderkey, upper(o_orderpriority) as up, lower(o_orderstatus) as lo, "
    "substr(o_orderpriority, 1, 3) as sub, length(o_orderpriority) as len, "
    "concat(o_orderstatus, '-', o_orderpriority) as cat, "
    "trim(o_orderpriority) as tr, replace(o_orderpriority, '-', '_') as rep "
    "from orders",
    None,
    "string scalar functions (identical semantics in DuckDB)",
)
_reg_sql(
    "f_math_funcs",
    # floor/ceil: BIGINT in Spark but DOUBLE in DuckDB — explicit cast
    # makes the value bits identical under the driver's exact hash.
    "select l_orderkey, l_linenumber, abs(l_quantity - 25) as ab, "
    "cast(floor(l_extendedprice / 1000) as bigint) as fl, "
    "cast(ceil(l_extendedprice / 1000) as bigint) as ce, "
    "l_orderkey % 7 as md, sqrt(l_quantity) as sq, "
    "greatest(l_quantity, l_linenumber) as gr, least(l_tax, l_discount) as le, "
    "coalesce(nullif(l_tax, 0.0), -1.0) as co "
    "from lineitem",
    None,
    "math/conditional scalar functions",
)
_reg_sql(
    "f_date_funcs",
    "select o_orderkey, year(o_orderdate) as y, month(o_orderdate) as m, "
    "day(o_orderdate) as d, hour(o_orderdate) as h, "
    "date_trunc('month', o_orderdate) as mon, "
    "o_orderdate + interval 1 day as next_day "
    "from orders",
    "SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m, "
    "day(o_orderdate) AS d, hour(o_orderdate) AS h, "
    "date_trunc('month', o_orderdate)::TIMESTAMP AS mon, "  # DuckDB month-trunc yields DATE
    "o_orderdate + INTERVAL 1 DAY AS next_day FROM orders",
    "date/time scalar functions",
)
_reg(
    "f_json_funcs",
    lambda spark, sf_dir: _events(spark, sf_dir).select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.from_json("props", "k bigint")["k"].alias("k_struct"),
    ),
    "SELECT event_id, json_extract_string(props, '$.k') AS k_str, "
    "json_extract(props, '$.k')::BIGINT AS k, "
    "json_extract(props, '$.k')::BIGINT AS k_struct FROM events",
    "JSON extraction: get_json_object path access + from_json struct parse "
    "(semi-structured props column)",
)

_reg_sql(
    "f_regex_funcs",
    r"select doc_id, regexp_extract(text, '([a-z]+)', 1) as first_word, "
    r"regexp_replace(text, 'data', 'DATA') as rep from documents",
    r"SELECT doc_id, regexp_extract(text, '([a-z]+)', 1) AS first_word, "
    r"regexp_replace(text, 'data', 'DATA', 'g') AS rep FROM documents",
    "regex scalar functions (Spark replaces all by default; DuckDB needs 'g')",
)

# --------------------------------------------------------------------------
# grouped aggregates: SQL percentile + applyInPandas grouped-map
# --------------------------------------------------------------------------

_reg_sql(
    "a_percentile",
    "select l_returnflag, round(percentile(l_quantity, 0.5), 4) as med, "
    "round(percentile(l_quantity, 0.9), 4) as p90 from lineitem "
    "group by l_returnflag",
    "SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS med, "
    "round(quantile_cont(l_quantity, 0.9), 4) AS p90 FROM lineitem "
    "GROUP BY l_returnflag",
    "exact interpolated percentiles (A11 extension)",
)


def _grouped_map_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map (UDTF-like surface, SURVEY §2.11):
    per-group pandas computation whose result a SQL oracle can verify."""
    import pandas as pd

    def median_of(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "med": [round(float(pdf["l_quantity"].median()), 4)],
                "n": [len(pdf)],
            }
        )

    return (
        engine_for(spark, sf_dir)
        .spark.table("lineitem")
        .select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(median_of, schema="l_returnflag string, med double, n long")
    )


def _grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF surface, SURVEY §2.11): a
    quantity-weighted mean price per returnflag, computed as one Arrow
    batch per group — partial aggregation doesn't apply to opaque
    UDAFs, so at 100 TB prefer expressing algebraic aggregates as
    built-ins; this is the escape hatch for genuinely custom math."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        engine_for(spark, sf_dir)
        .spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(wmean("l_extendedprice", "l_quantity"), 4).alias("wmean_price"))
    )


_reg(
    "x_grouped_agg_udaf",
    _grouped_agg_udaf,
    "SELECT l_returnflag, "
    "round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean_price "
    "FROM lineitem GROUP BY l_returnflag",
    "grouped-agg pandas UDF (Arrow-batched UDAF) with SQL-verifiable output",
)

_reg(
    "x_grouped_map",
    _grouped_map_median,
    "SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS med, "
    "count(*) AS n FROM lineitem GROUP BY l_returnflag",
    "Arrow grouped-map applyInPandas with SQL-verifiable output",
)

# --------------------------------------------------------------------------
# skew-safe aggregation (exactness check vs plain GROUP BY oracle)
# --------------------------------------------------------------------------


def _salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_agg

    li = engine_for(spark, sf_dir).spark.table("lineitem")
    return salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "cnt": ("l_quantity", "count"),
            "max_q": ("l_quantity", "max"),
            "min_q": ("l_quantity", "min"),
        },
        buckets=16,
    )


def _salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.skew import salted_join

    eng = engine_for(spark, sf_dir)
    li = eng.spark.table("lineitem").select("l_orderkey", "l_quantity")
    orders = eng.spark.table("orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    return salted_join(li, orders, on=["l_orderkey"], buckets=8).select(
        "l_orderkey", "l_quantity", F.round("o_totalprice", 4).alias("o_totalprice")
    )


_reg(
    "j_salted",
    _salted_join,
    "SELECT l_orderkey, l_quantity, round(o_totalprice, 4) AS o_totalprice "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
    "replicate-and-salt skew join == plain equi-join (hot-key mitigation)",
)

_reg(
    "a_salted_agg",
    _salted,
    "SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(l_quantity) AS cnt, "
    "max(l_quantity) AS max_q, min(l_quantity) AS min_q "
    "FROM lineitem GROUP BY l_returnflag",
    "two-phase salted aggregation == plain GROUP BY (hot-key mitigation)",
)

# --------------------------------------------------------------------------
# deterministic sampling / splits (training-pipeline surface)
# --------------------------------------------------------------------------

_BUCKET_SQL = "substr(md5(doc_id || ':42'), 1, 8)"

_reg(
    "x_hash_split",
    lambda spark, sf_dir: hash_split(
        _docs(spark, sf_dir),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=42,
    ).select("doc_id", "lang", "split"),
    f"SELECT doc_id, lang, CASE"
    f" WHEN {_BUCKET_SQL} < '{hex_threshold(0.8)}' THEN 'train'"
    f" WHEN {_BUCKET_SQL} < '{hex_threshold(0.9)}' THEN 'val'"
    f" ELSE 'test' END AS split FROM documents",
    "deterministic hash-based train/val/test split (map-side, RNG-free, "
    "partitioning-independent)",
)

_reg(
    "x_hash_sample",
    lambda spark, sf_dir: hash_sample(
        _docs(spark, sf_dir), "doc_id", 0.25, seed=42
    ).select("doc_id", "lang", "source"),
    f"SELECT doc_id, lang, source FROM documents"
    f" WHERE {_BUCKET_SQL} < '{hex_threshold(0.25)}'",
    "deterministic 25% sample by id hash",
)

_reg(
    "x_stratified_sample",
    lambda spark, sf_dir: stratified_hash_sample(
        _docs(spark, sf_dir),
        "doc_id",
        "lang",
        {"en": 0.5, "de": 1.0},
        seed=42,
        default_fraction=0.25,
    ).select("doc_id", "lang"),
    f"SELECT doc_id, lang FROM documents WHERE {_BUCKET_SQL} < CASE lang"
    f" WHEN 'en' THEN '{hex_threshold(0.5)}'"
    f" WHEN 'de' THEN '{hex_threshold(1.0)}'"
    f" ELSE '{hex_threshold(0.25)}' END",
    "per-stratum deterministic sampling (downsample dominant strata)",
)

# --------------------------------------------------------------------------
# modern-dialect aggregation surface (GROUP BY ALL, ordered string/array agg)
# --------------------------------------------------------------------------

_reg_sql(
    "p_null_semantics",
    "select l_orderkey, l_linenumber, nullif(l_tax, 0.0) as t, "
    "coalesce(nullif(l_tax, 0.0), -1.0) as t_filled, "
    "(nullif(l_tax, 0.0) is distinct from nullif(l_discount, 0.0)) as dist "
    "from lineitem "
    "order by t nulls first, l_orderkey, l_linenumber limit 100",
    "SELECT l_orderkey, l_linenumber, nullif(l_tax, 0.0) AS t, "
    "coalesce(nullif(l_tax, 0.0), -1.0) AS t_filled, "
    "(nullif(l_tax, 0.0) IS DISTINCT FROM nullif(l_discount, 0.0)) AS dist "
    "FROM lineitem "
    "ORDER BY t NULLS FIRST, l_orderkey, l_linenumber LIMIT 100",
    "NULL semantics: nullif/coalesce, IS DISTINCT FROM (null-safe compare), "
    "NULLS FIRST ordering",
)

_reg_sql(
    "w_time_range",
    "select event_id, user_id, "
    "round(sum(value) over (partition by user_id order by ts "
    "range between interval 1 hour preceding and current row), 4) as rolling_1h "
    "from events",
    "SELECT event_id, user_id, "
    "round(sum(value) OVER (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS rolling_1h "
    "FROM events",
    "event-time RANGE frame: per-user rolling 1h sum (the batch twin of a "
    "sliding stream window)",
)

_reg_sql(
    "a_stats_agg",
    "select l_returnflag, round(stddev_samp(l_quantity), 6) as sd, "
    "round(var_samp(l_quantity), 6) as vr, "
    "round(corr(l_quantity, l_extendedprice), 6) as cor, "
    "round(covar_samp(l_quantity, l_extendedprice), 4) as cov "
    "from lineitem group by l_returnflag",
    "SELECT l_returnflag, round(stddev_samp(l_quantity), 6) AS sd, "
    "round(var_samp(l_quantity), 6) AS vr, "
    "round(corr(l_quantity, l_extendedprice), 6) AS cor, "
    "round(covar_samp(l_quantity, l_extendedprice), 4) AS cov "
    "FROM lineitem GROUP BY l_returnflag",
    "statistical aggregates: stddev / variance / correlation / covariance",
)

_reg_sql(
    "f_bitwise",
    "select l_orderkey, l_orderkey & 255 as lo, l_orderkey | 15 as orr, "
    "l_orderkey ^ l_linenumber as xr, shiftleft(l_linenumber, 3) as shl, "
    "shiftright(l_orderkey, 2) as shr from lineitem",
    "SELECT l_orderkey, l_orderkey & 255 AS lo, l_orderkey | 15 AS orr, "
    "xor(l_orderkey, l_linenumber) AS xr, l_linenumber << 3 AS shl, "
    "l_orderkey >> 2 AS shr FROM lineitem",
    "bitwise operators (the primitives under simhash/zorder, exposed in SQL)",
)

_reg_sql(
    "f_explode",
    r"select doc_id, word from documents "
    r"lateral view explode(split(trim(lower(text)), '\\s+')) t as word "
    r"where length(word) > 0",
    r"WITH u AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+'))"
    r" AS word FROM documents) SELECT doc_id, word FROM u WHERE length(word) > 0",
    "explode/lateral view: one row per token (the tokenize-then-aggregate "
    "fan-out; generator runs inside codegen, no Python)",
)

_reg_sql(
    "j_hint_broadcast",
    "select /*+ BROADCAST(nation) */ n_name, count(*) as n "
    "from customer join nation on c_nationkey = n_nationkey group by n_name",
    "SELECT n_name, count(*) AS n FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    "explicit BROADCAST hint (pin the strategy when stats would mislead)",
)

_reg_sql(
    "a_groupby_all",
    "select l_returnflag, l_linestatus, sum(l_quantity) as s from lineitem "
    "group by all",
    None,  # identical SQL runs on DuckDB
    "GROUP BY ALL (infer grouping keys from the select list)",
)

_reg_sql(
    "f_array_agg",
    "select l_orderkey, array_join(sort_array(collect_list(l_linenumber)), ',') "
    "as lines from lineitem group by l_orderkey",
    "SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') "
    "AS lines FROM lineitem GROUP BY l_orderkey",
    "array aggregation (collect_list + sort for deterministic cross-engine "
    "comparison; ArrayType is free headroom over the reference, SURVEY §1)",
)

_reg_sql(
    "a_listagg",
    "select l_returnflag, listagg(l_linestatus, ',') "
    "within group (order by l_linestatus) as statuses "
    "from lineitem group by l_returnflag",
    "SELECT l_returnflag, string_agg(l_linestatus, ',' ORDER BY l_linestatus) "
    "AS statuses FROM lineitem GROUP BY l_returnflag",
    "ordered string aggregation (listagg WITHIN GROUP ≡ DuckDB string_agg)",
)

# --------------------------------------------------------------------------
# sequence packing (token-budget bin assignment for training batches)
# --------------------------------------------------------------------------

_reg(
    "x_pack_sequences",
    lambda spark, sf_dir: pack_sequences(
        _docs(spark, sf_dir).select(
            "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
        ),
        group_col="lang",
        order_col="doc_id",
        tokens_col="n_tokens",
        capacity=512,
    ).select("doc_id", "lang", "n_tokens", "bin", "bin_offset"),
    r"WITH t AS (SELECT doc_id, lang, CASE WHEN length(trim(text)) = 0 THEN 0"
    r" ELSE length(string_split_regex(trim(text), '\s+')) END AS n_tokens"
    r" FROM documents), "
    r"c AS (SELECT doc_id, lang, n_tokens,"
    r" coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id"
    r"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t) "
    r"SELECT doc_id, lang, n_tokens, floor(cb / 512)::INT AS bin,"
    r" (cb % 512)::BIGINT AS bin_offset FROM c",
    "sequence packing: contiguous-fill token-budget bins per lang "
    "(one window cumsum, engine-portable determinism)",
)

# --------------------------------------------------------------------------
# end-to-end curation pipeline (the whole training-data story, one query)
# --------------------------------------------------------------------------


def _curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pipeline: quality gate → exact dedup (min-id per
    normalized-text fingerprint) → deterministic train/val/test split.
    Every stage is individually oracle-checked elsewhere; this entry
    checks their composition — the shape an actual 100 TB corpus run
    takes (filter pushes to scan; dedup is the only shuffle; split is
    map-side).
    """
    docs = _docs(spark, sf_dir)
    quality = docs.filter(
        (token_count(F.col("text")) >= 30)
        & (
            F.length(F.regexp_replace(F.trim(F.col("text")), r"[A-Za-z0-9\s]", ""))
            / F.length(F.trim(F.col("text")))
            < 0.2
        )
    )
    keyed = quality.withColumn("__fp", fingerprint(F.col("text")))
    winners = keyed.groupBy("__fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    deduped = keyed.join(winners, "doc_id", "inner").drop("__fp")
    return hash_split(
        deduped, "doc_id", {"train": 0.9, "val": 0.1}, seed=42
    ).select("doc_id", "lang", "split")


_reg(
    "pipe_curation",
    _curation_pipeline,
    r"WITH q AS ("
    r" SELECT doc_id, lang, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp"
    r" FROM documents"
    r" WHERE CASE WHEN length(trim(text)) = 0 THEN 0"
    r"  ELSE length(string_split_regex(trim(text), '\s+')) END >= 30"
    r" AND length(regexp_replace(trim(text), '[A-Za-z0-9\s]', '', 'g'))::DOUBLE"
    r"  / length(trim(text)) < 0.2), "
    r"w AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY fp) "
    r"SELECT q.doc_id, q.lang, CASE"
    f" WHEN {_BUCKET_SQL.replace('doc_id', 'q.doc_id')} < '{hex_threshold(0.9)}'"
    r" THEN 'train' ELSE 'val' END AS split "
    r"FROM q JOIN w ON q.doc_id = w.doc_id",
    "end-to-end curation: quality gate → fingerprint dedup → hash split, "
    "composed stages oracle-checked as one query",
)

# --------------------------------------------------------------------------
# streaming dedup
# --------------------------------------------------------------------------

_reg_sql(
    "st_rollup_multires",
    "select date_trunc('hour', ts) as b_hour, date_trunc('day', ts) as b_day, "
    "event_type, count(*) as n, round(sum(value), 4) as sum_value "
    "from events group by grouping sets "
    "((date_trunc('hour', ts), event_type), (date_trunc('day', ts), event_type))",
    "SELECT date_trunc('hour', ts)::TIMESTAMP AS b_hour, "  # DuckDB day-trunc yields DATE
    "date_trunc('day', ts)::TIMESTAMP AS b_day, "
    "event_type, count(*) AS n, round(sum(value), 4) AS sum_value "
    "FROM events GROUP BY GROUPING SETS "
    "((date_trunc('hour', ts), event_type), (date_trunc('day', ts), event_type))",
    "hypertable-style multi-resolution rollup: hourly + daily aggregates in "
    "ONE pass / one shuffle via GROUPING SETS (vs two scans at 100 TB)",
)

_reg(
    "st_stream_join",
    lambda spark, sf_dir: purchase_attribution(_events(spark, sf_dir), "2 hours").select(
        "click_id", "user_id", F.round("purchase_value", 4).alias("purchase_value")
    ),
    "SELECT c.event_id AS click_id, c.user_id, round(p.value, 4) AS purchase_value "
    "FROM events c JOIN events p ON c.event_type = 'click' "
    "AND p.event_type = 'purchase' AND p.user_id = c.user_id "
    "AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 2 HOUR",
    "stream-stream interval join (watermark-bounded state in stream mode; "
    "batch path oracle-checked)",
)

_reg(
    "a_approx_agg",
    # Certificate shape (same pattern as a_hll_sketch_rollup): the
    # sketch estimates themselves are implementation-defined, so the
    # oracle-checkable output is (exact value, within-tolerance flag) —
    # the booleans certify the HLL++/GK error bounds held while staying
    # deterministic cross-engine.
    lambda spark, sf_dir: engine_for(spark, sf_dir)
    .spark.table("lineitem")
    .groupBy("l_returnflag")
    .agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("apx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("apx_med"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("__exact_med"),
    )
    .select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("apx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("ok_orders"),
        F.round("__exact_med", 4).alias("exact_med"),
        (
            F.abs(F.col("apx_med") - F.col("__exact_med"))
            <= 0.02 * F.col("__exact_med")
        ).alias("ok_med"),
    )
    .orderBy("l_returnflag"),
    "SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders, "
    "true AS ok_orders, "
    "round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_med, "
    "true AS ok_med "
    "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag",
    "sketch aggregates with exactness certificate: HLL++ count-distinct "
    "+ approximate percentile vs their exact counterparts — single-pass, "
    "fixed-size state (the 100 TB substitute for exact distinct)",
)


def _hll_rollup_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches-HLL mergeable rollup: daily per-event_type sketch
    partials unioned to a per-event_type distinct-user estimate. The
    oracle-checkable output is (exact count, within-tolerance flag):
    the estimate itself is implementation-defined, but its 3%-of-exact
    certificate (lgk=14 → 0.8% RSE, so ~3.7σ) is deterministic."""
    from .functions.sketches import hll_estimate_exactish

    ev = engine_for(spark, sf_dir).spark.table("events")
    ev = ev.withColumn("day", F.date_trunc("day", "ts"))
    return (
        hll_estimate_exactish(
            ev, ["event_type"], "day", "user_id", lgk=14, rel_tol=0.03
        )
        # drop the implementation-defined estimate; the oracle compares
        # the deterministic (exact, certificate) pair only
        .select("event_type", "exact_distinct", "within_tol")
        .orderBy("event_type")
    )


_reg(
    "a_hll_sketch_rollup",
    _hll_rollup_entry,
    "SELECT event_type, count(DISTINCT user_id) AS exact_distinct, "
    "true AS within_tol FROM events GROUP BY event_type ORDER BY event_type",
    "mergeable HLL sketch rollup: per-day binary partials -> union-agg "
    "estimate; the persisted-pre-aggregate pattern that replaces "
    "fact-table rescans for distinct counts at 100 TB",
)

def _hll_intersect_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set-ALGEBRA certificate: |A ∩ B| estimated by inclusion-
    exclusion over two MERGED sketches (est_a + est_b − est_union,
    union via hll_union — no rescan of either input), checked against
    the exact intersection. A = users who clicked, B = users who
    purchased; the overlap is a large fraction of the union, the
    regime where inclusion-exclusion is trustworthy. Oracle output is
    the deterministic (exact sizes, certificate flag) tuple; the
    estimates themselves are implementation-defined and dropped."""
    from .functions.sketches import hll_intersect_estimate
    from .operators.scalars import broadcast_attach

    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    est = hll_intersect_estimate(a, b, "user_id", lgk=14)
    exact = broadcast_attach(
        a.agg(F.count_distinct("user_id").alias("exact_a")),
        b.agg(F.count_distinct("user_id").alias("exact_b")),
    )
    exact = broadcast_attach(
        exact,
        a.select("user_id")
        .intersect(b.select("user_id"))
        .agg(F.count("*").cast("bigint").alias("exact_intersect")),
    )
    return broadcast_attach(est, exact).select(
        "exact_a",
        "exact_b",
        "exact_intersect",
        (
            F.abs(F.col("est_intersect") - F.col("exact_intersect"))
            <= 0.05 * F.col("exact_intersect")
        ).alias("within_tol"),
    )


_reg(
    "a_hll_intersect_cert",
    _hll_intersect_entry,
    "SELECT (SELECT count(DISTINCT user_id) FROM events "
    "WHERE event_type = 'click')::BIGINT AS exact_a, "
    "(SELECT count(DISTINCT user_id) FROM events "
    "WHERE event_type = 'purchase')::BIGINT AS exact_b, "
    "(SELECT count(*) FROM (SELECT DISTINCT user_id FROM events "
    "WHERE event_type = 'click' INTERSECT SELECT DISTINCT user_id "
    "FROM events WHERE event_type = 'purchase'))::BIGINT "
    "AS exact_intersect, "
    "true AS within_tol",
    "HLL set algebra: |A∩B| by inclusion-exclusion over MERGED "
    "sketches (hll_union, no input rescan) with an exactness "
    "certificate — answers cross-source overlap questions from "
    "persisted per-source sketches alone",
)

_reg(
    "st_dedup",
    lambda spark, sf_dir: _events(spark, sf_dir)
    .dropDuplicates(["event_id"])
    .select("event_id", "user_id", "event_type"),
    "SELECT event_id, user_id, event_type FROM ("
    "SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn "
    "FROM events) t WHERE rn = 1",
    "exactly-once event dedup (streaming: dropDuplicatesWithinWatermark)",
)


# --------------------------------------------------------------------------
# higher-order / collection / safe-cast scalar surface (extension —
# reference has no scalar functions beyond dates, SURVEY.md §2.3)
# --------------------------------------------------------------------------

_reg_sql(
    "f_higher_order",
    "select vec_id, "
    "size(filter(embedding, x -> x > 0)) as n_pos, "
    "round(aggregate(embedding, cast(0.0 as double), "
    "(acc, x) -> acc + cast(x as double) * cast(x as double)), 3) as norm2, "
    "round(aggregate(embedding, cast(0.0 as double), "
    "(acc, x) -> acc + greatest(cast(x as double), 0.0)), 3) as pos_mass, "
    "round(cast(array_max(embedding) as double), 3) as max_c "
    "from embeddings",
    "SELECT vec_id, "
    "len(list_filter(embedding, x -> x > 0)) AS n_pos, "
    "round(list_aggregate(list_transform(embedding, "
    "x -> cast(x as double) * cast(x as double)), 'sum'), 3) AS norm2, "
    "round(list_aggregate(list_transform(embedding, "
    "x -> greatest(cast(x as double), 0.0)), 'sum'), 3) AS pos_mass, "
    "round(cast(list_max(embedding) as double), 3) AS max_c "
    "FROM embeddings",
    "higher-order array functions (filter/aggregate-fold/array_max) over "
    "array<float> — JVM-side lambdas, no Python; the fold runs in list "
    "order so both engines produce identical bits (rounded to absorb "
    "last-ulp formatting)",
)
_reg_sql(
    "f_map_funcs",
    "select event_id, event_type, "
    "element_at(map('click', 1, 'view', 2, 'purchase', 3, "
    "'signup', 4, 'error', 5), event_type) as type_code, "
    "size(map_concat(map('a', 1), map('b', 2))) as m_size, "
    "array_join(map_keys(map('a', 1, 'b', 2)), ',') as keys_csv "
    "from events where event_id < 100",
    "SELECT event_id, event_type, "
    "CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 "
    "WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 WHEN 'error' THEN 5 END "
    "AS type_code, 2 AS m_size, 'a,b' AS keys_csv "
    "FROM events WHERE event_id < 100",
    "map construction / lookup / concat / keys (MapType is extension "
    "surface — reference has no nested types, SURVEY.md §1)",
)
_reg_sql(
    "f_try_cast",
    "select doc_id, "
    "try_cast(lang as int) as bad_int, "
    "try_cast(cast(n_chars as string) as int) as roundtrip_int, "
    "try_cast('not a date' as timestamp) as bad_ts "
    "from documents",
    "SELECT doc_id, "
    "TRY_CAST(lang AS INT) AS bad_int, "
    "TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS roundtrip_int, "
    "TRY_CAST('not a date' AS TIMESTAMP) AS bad_ts "
    "FROM documents",
    "TRY_CAST: malformed input yields NULL instead of failing the job — "
    "at 100 TB one bad row must not kill a 1000-executor stage",
)
_reg_sql(
    "a_maxby_minby",
    "select event_type, "
    "max_by(user_id, event_id) as last_user, "
    "min_by(user_id, event_id) as first_user, "
    "any_value(event_type) as sample_type "
    "from events group by event_type order by event_type",
    "SELECT event_type, "
    "max_by(user_id, event_id) AS last_user, "
    "min_by(user_id, event_id) AS first_user, "
    "any_value(event_type) AS sample_type "
    "FROM events GROUP BY event_type ORDER BY event_type",
    "argmax/argmin aggregates keyed on the unique event_id (single-pass "
    "substitutes for self-join-on-max); any_value is deterministic here "
    "because it equals the group key",
)


def _union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-independent union: columns align by NAME, so upstream
    schema reordering (common across 100 TB of heterogeneous parquet
    batches) cannot silently mis-zip columns like positional UNION."""
    eng = engine_for(spark, sf_dir)
    a = eng.spark.table("nation").select("n_nationkey", "n_name")
    b = (
        eng.spark.table("nation")
        .filter("n_regionkey = 0")
        .select("n_name", "n_nationkey")  # deliberately reversed order
    )
    return a.unionByName(b)


_reg(
    "u_union_byname",
    _union_byname,
    "SELECT n_nationkey, n_name FROM nation "
    "UNION ALL SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 0",
    "unionByName (by-name column alignment; U1-U6 extension — Spark "
    "DataFrame API, no ANSI SQL spelling)",
)


# --------------------------------------------------------------------------
# analytics patterns: grouping-id, per-group top-k, gap-fill, PII scrub
# --------------------------------------------------------------------------

_reg_sql(
    "a_grouping_fn",
    "select l_returnflag, l_linestatus, "
    "grouping(l_returnflag) as g_rf, grouping(l_linestatus) as g_ls, "
    "sum(l_quantity) as sum_qty "
    "from lineitem group by rollup(l_returnflag, l_linestatus)",
    "SELECT l_returnflag, l_linestatus, "
    "GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls, "
    "sum(l_quantity) AS sum_qty "
    "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
    "GROUPING() disambiguates rollup-generated NULLs from data NULLs "
    "(A11 extension; without it subtotal rows are unidentifiable)",
)
_reg_sql(
    "x_topk_per_group",
    "select o_orderpriority, o_orderkey, o_totalprice from ("
    "select o_orderpriority, o_orderkey, o_totalprice, "
    "row_number() over (partition by o_orderpriority "
    "order by o_totalprice desc, o_orderkey) as rn "
    "from orders) ranked where rn <= 3",
    None,  # identical SQL runs on DuckDB
    "per-group top-k via ranked window + filter: one shuffle on the "
    "group key, each partition keeps k rows — the scalable form of "
    "'N largest per category' (vs a self-join on max)",
)
_reg_sql(
    "ts_gapfill",
    "with days as (select explode(sequence(cast('2024-01-01' as timestamp), "
    "cast('2024-02-10' as timestamp), interval 1 day)) as day), "
    "counts as (select date_trunc('day', ts) as day, count(*) as n_events "
    "from events group by date_trunc('day', ts)) "
    "select d.day, coalesce(c.n_events, 0) as n_events "
    "from days d left join counts c on d.day = c.day",
    "WITH days AS (SELECT unnest(generate_series(TIMESTAMP '2024-01-01', "
    "TIMESTAMP '2024-02-10', INTERVAL 1 DAY)) AS day), "
    "counts AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
    "count(*) AS n_events FROM events GROUP BY 1) "
    "SELECT d.day, coalesce(c.n_events, 0) AS n_events "
    "FROM days d LEFT JOIN counts c ON d.day = c.day",
    "time-series gap filling: generated calendar spine LEFT JOIN "
    "aggregated facts, missing buckets -> 0. The spine is tiny so "
    "Catalyst broadcasts it; the fact agg is the only shuffle",
)
_reg_sql(
    "txt_pii_scrub",
    "select doc_id, "
    "regexp_replace(regexp_replace("
    "concat(text, ' contact user', cast(doc_id as string), "
    "'@example.com or 555-123-4567'), "
    "'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[a-zA-Z]', '<EMAIL>'), "
    "'[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>') as clean "
    "from documents",
    "SELECT doc_id, "
    "regexp_replace(regexp_replace("
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
    "'@example.com or 555-123-4567'), "
    "'[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[a-zA-Z]', '<EMAIL>', 'g'), "
    "'[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean "
    "FROM documents",
    "PII redaction (emails/phones) for training-data curation; pure "
    "JVM regexp_replace, no Python in the hot path. Synthetic PII is "
    "appended first because the corpus contains none (portable "
    "[0-9]-class patterns — no \\d/\\b dialect divergence)",
)


# --------------------------------------------------------------------------
# forward fill + file-metadata lineage
# --------------------------------------------------------------------------

_reg_sql(
    "w_ffill",
    "select event_id, user_id, ts, "
    "last_value(case when event_type <> 'error' then value end) ignore nulls "
    "over (partition by user_id order by ts, event_id "
    "rows between unbounded preceding and current row) as v_ffill "
    "from events",
    "SELECT event_id, user_id, ts, "
    "last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS) "
    "OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill "
    "FROM events",
    "forward fill (last observation carried forward) per user: error "
    "events' values are nulled then filled from the last good reading — "
    "the standard sensor/time-series repair; one shuffle on user_id "
    "(note the engines spell IGNORE NULLS differently)",
)


def _file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row provenance via the hidden _metadata struct: at 100 TB,
    tracing a corrupt row back to its source file is the difference
    between reprocessing one file and reprocessing a day."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select(
        "doc_id",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("fname"),
    )


_reg(
    "x_file_metadata",
    _file_metadata,
    "SELECT doc_id, 'documents.parquet' AS fname FROM documents",
    "hidden _metadata.file_path column exposed as row-level lineage "
    "(constant oracle works because each table is a single parquet file)",
)


_reg_sql(
    "f_array_setops",
    "select l_orderkey, l_linenumber, "
    "sort_array(array_intersect(array(l_partkey % 7, l_suppkey % 7, 3), "
    "array(l_suppkey % 7, 5))) as inter, "
    "sort_array(array_union(array(l_partkey % 7), array(l_suppkey % 7, 5))) as uni, "
    "sort_array(array_except(array(l_partkey % 7, l_suppkey % 7), array(3, 5))) as exc, "
    "array_contains(array(l_partkey % 7), 3) as has3 "
    "from lineitem",
    "SELECT l_orderkey, l_linenumber, "
    "list_sort(list_intersect([l_partkey % 7, l_suppkey % 7, 3], "
    "[l_suppkey % 7, 5])) AS inter, "
    "list_sort(list_distinct(list_concat([l_partkey % 7], "
    "[l_suppkey % 7, 5]))) AS uni, "
    "list_sort(list_distinct(list_filter([l_partkey % 7, l_suppkey % 7], "
    "x -> NOT list_contains([3, 5], x)))) AS exc, "
    "list_contains([l_partkey % 7], 3) AS has3 "
    "FROM lineitem",
    "array set algebra (intersect/union/except/contains) — JVM-side, "
    "sorted to a canonical order because the engines differ on "
    "first-occurrence order (DuckDB 1.0 lacks list_union; emulated "
    "with distinct+concat)",
)


_reg_sql(
    "a_percentile_within",
    "select l_returnflag, "
    "percentile_cont(0.25) within group (order by l_quantity) as q1, "
    "percentile_cont(0.75) within group (order by l_quantity) as q3, "
    "percentile_disc(0.5) within group (order by l_quantity) as med_disc "
    "from lineitem group by l_returnflag",
    None,  # identical ordered-set aggregate syntax runs on DuckDB
    "ANSI ordered-set aggregates (percentile_cont interpolates, "
    "percentile_disc picks an actual row value) — exact but "
    "sort-per-group; at 100 TB prefer approx_percentile sketches "
    "(a_approx_agg) unless exactness is contractual",
)
_reg_sql(
    "f_url_funcs",
    "select doc_id, "
    "parse_url(concat('https://', source, '.example.com/docs/', "
    "cast(doc_id as string), '?lang=', lang), 'HOST') as host, "
    "parse_url(concat('https://', source, '.example.com/docs/', "
    "cast(doc_id as string), '?lang=', lang), 'PATH') as path, "
    "parse_url(concat('https://', source, '.example.com/docs/', "
    "cast(doc_id as string), '?lang=', lang), 'QUERY', 'lang') as qlang "
    "from documents",
    "SELECT doc_id, "
    "source || '.example.com' AS host, "
    "'/docs/' || CAST(doc_id AS VARCHAR) AS path, "
    "lang AS qlang "
    "FROM documents",
    "URL parsing (host/path/query-param) — crawl-data normalization for "
    "dedup-by-URL; JVM-side parse_url, oracle reconstructs "
    "componentwise from the synthesized URL",
)
_reg_sql(
    "f_url_canonicalize",
    # Crawl-URL canonicalization — the normalization pass before
    # dedup-by-URL: drop the fragment, strip utm_* tracking params
    # (repairing the FIRST surviving separator if '?utm_' led the
    # query string — the repair prefix is [^?&]+ because the base URL
    # contains neither '?' nor '&', so the first remaining '&' is the
    # one to turn into '?'; a bare [^?]+ prefix would greedily match
    # through earlier '&'s and rewrite the last one),
    # lowercase the host but NOT the path (paths are case-significant).
    # The messy URL is synthesized from columns so both engines see
    # identical input. Spark regexp_replace is global by default;
    # DuckDB needs the 'g' flag and \1 backreferences — hence two
    # dialect texts for the same recipe.
    "with u as (select doc_id, concat('https://', upper(source), "
    "'.Example.COM/Docs/', cast(doc_id as string), "
    "'?utm_source=x&lang=', lang, '&utm_campaign=y#frag') as url "
    "from documents), "
    "s as (select doc_id, url, regexp_replace(regexp_replace("
    "regexp_replace(url, '#.*$', ''), '[?&]utm_[^&]*', ''), "
    r"'^([^?&]+)&', '$1?') as noq from u) "
    "select doc_id, url, concat('https://', "
    "lower(regexp_extract(noq, 'https://([^/]+)', 1)), "
    "regexp_replace(noq, '^https://[^/]+', '')) as canonical_url "
    "from s order by doc_id",
    "WITH u AS (SELECT doc_id, 'https://' || upper(source) || "
    "'.Example.COM/Docs/' || CAST(doc_id AS VARCHAR) || "
    "'?utm_source=x&lang=' || lang || '&utm_campaign=y#frag' AS url "
    "FROM documents), "
    "s AS (SELECT doc_id, url, regexp_replace(regexp_replace("
    "regexp_replace(url, '#.*$', ''), '[?&]utm_[^&]*', '', 'g'), "
    r"'^([^?&]+)&', '\1?') AS noq FROM u) "
    "SELECT doc_id, url, 'https://' || "
    "lower(regexp_extract(noq, 'https://([^/]+)', 1)) || "
    "regexp_replace(noq, '^https://[^/]+', '') AS canonical_url "
    "FROM s ORDER BY doc_id",
    "URL canonicalization (fragment strip, utm param removal with "
    "separator repair, host lowercased, path case preserved) — the "
    "normalization before dedup-by-URL",
)

_reg_sql(
    "dd_url_dedup",
    # Dedup-by-URL: group on the canonicalized URL (tracking params and
    # fragments collapse URL variants of one page) and keep the min-id
    # doc — composes f_url_canonicalize's recipe with the dd_exact
    # survivor policy. At crawl scale the group key is md5(canonical)
    # (fixed-width shuffle), same discipline as dd_exact; the synthetic
    # URLs make ~1 variant per doc here, so survivors == docs — the
    # differential still pins the whole canonicalize+group+survive
    # pipeline per row.
    "with u as (select doc_id, concat('https://', upper(source), "
    "'.Example.COM/Docs/', cast(doc_id as string), "
    "'?utm_source=x&lang=', lang, '&utm_campaign=y#frag') as url "
    "from documents), "
    "s as (select doc_id, regexp_replace(regexp_replace("
    "regexp_replace(url, '#.*$', ''), '[?&]utm_[^&]*', ''), "
    r"'^([^?&]+)&', '$1?') as noq from u), "
    "c as (select doc_id, concat('https://', "
    "lower(regexp_extract(noq, 'https://([^/]+)', 1)), "
    "regexp_replace(noq, '^https://[^/]+', '')) as curl from s) "
    "select min(doc_id) as doc_id, md5(curl) as url_key, "
    "cast(count(*) as bigint) as n_variants "
    "from c group by md5(curl) order by doc_id",
    "WITH u AS (SELECT doc_id, 'https://' || upper(source) || "
    "'.Example.COM/Docs/' || CAST(doc_id AS VARCHAR) || "
    "'?utm_source=x&lang=' || lang || '&utm_campaign=y#frag' AS url "
    "FROM documents), "
    "s AS (SELECT doc_id, regexp_replace(regexp_replace("
    "regexp_replace(url, '#.*$', ''), '[?&]utm_[^&]*', '', 'g'), "
    r"'^([^?&]+)&', '\1?') AS noq FROM u), "
    "c AS (SELECT doc_id, 'https://' || "
    "lower(regexp_extract(noq, 'https://([^/]+)', 1)) || "
    "regexp_replace(noq, '^https://[^/]+', '') AS curl FROM s) "
    "SELECT min(doc_id) AS doc_id, md5(curl) AS url_key, "
    "CAST(count(*) AS BIGINT) AS n_variants "
    "FROM c GROUP BY md5(curl) ORDER BY doc_id",
    "dedup-by-canonical-URL (min-id survivor per canonicalized URL, "
    "md5 fixed-width group key) — crawl URL-level dedup",
)

_reg_sql(
    "a_benford_digits",
    # Benford first-digit audit — the classic tamper/synthetic-data
    # screen: natural multi-scale magnitudes follow log10(1+1/d);
    # uniform or fabricated values don't. First digit extracted
    # integer-exactly (floor + string head, no float log), expected
    # share as an exact-literal CASE so the comparison is
    # rounding-free; one tiny 9-row aggregate.
    "select digit, cast(count(*) as bigint) as n, "
    "round(count(*) / cast((select count(*) from events where value >= 1)"
    " as double), 4) as share, "
    "cast(case digit when '1' then 0.3010 when '2' then 0.1761 "
    "when '3' then 0.1249 when '4' then 0.0969 when '5' then 0.0792 "
    "when '6' then 0.0669 when '7' then 0.0580 when '8' then 0.0512 "
    "else 0.0458 end as double) as expected_share "
    "from (select substring(cast(cast(floor(value) as bigint) as string),"
    " 1, 1) as digit from events where value >= 1) t "
    "group by digit order by digit",
    "SELECT digit, CAST(count(*) AS BIGINT) AS n, "
    "round(count(*) / CAST((SELECT count(*) FROM events WHERE value >= 1)"
    " AS DOUBLE), 4) AS share, "
    "CAST(CASE digit WHEN '1' THEN 0.3010 WHEN '2' THEN 0.1761 "
    "WHEN '3' THEN 0.1249 WHEN '4' THEN 0.0969 WHEN '5' THEN 0.0792 "
    "WHEN '6' THEN 0.0669 WHEN '7' THEN 0.0580 WHEN '8' THEN 0.0512 "
    "ELSE 0.0458 END AS DOUBLE) AS expected_share "
    "FROM (SELECT substring(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR),"
    " 1, 1) AS digit FROM events WHERE value >= 1) t "
    "GROUP BY digit ORDER BY digit",
    "Benford first-digit distribution audit (integer-exact digit "
    "extraction; tamper/synthetic-data screen)",
)

_reg_sql(
    "x_topk_with_ties",
    # Per-group top-k WITH TIES (rank, not row_number): the "keep
    # every row tied with the k-th" semantics ANSI spells FETCH FIRST
    # k ROWS WITH TIES — subtly different output cardinality from
    # x_topk_per_group's exactly-k policy; both live in the catalog so
    # the distinction is pinned. Same single group-key shuffle.
    "select l_returnflag, l_orderkey, l_linenumber, l_quantity from ("
    "select l_returnflag, l_orderkey, l_linenumber, l_quantity, "
    "rank() over (partition by l_returnflag "
    "order by l_quantity desc) as rk from lineitem) t "
    "where rk <= 2 order by l_returnflag, l_orderkey, l_linenumber",
    None,  # identical SQL runs on DuckDB
    "per-group top-k WITH TIES (rank <= k keeps every row tied at the "
    "boundary — the FETCH FIRST ... WITH TIES semantics)",
)

_reg_sql(
    "ts_anomaly_mad",
    # Robust (median/MAD) outlier flags — the companion to ts_anomaly's
    # mean/std z-score: median and MAD ignore the outliers themselves,
    # so heavy-tailed value columns don't inflate their own threshold
    # (the 1.4826 factor scales MAD to sigma under normality). Exact
    # interpolated percentiles rounded to 4 decimals are the
    # cross-engine contract (a_percentile convention); the flag
    # comparison then evaluates identical doubles in both engines.
    "with med as (select user_id, "
    "round(percentile(value, 0.5), 4) as m from events group by user_id), "
    "mad as (select e.user_id, "
    "round(percentile(abs(e.value - med.m), 0.5), 4) as d "
    "from events e join med on e.user_id = med.user_id "
    "group by e.user_id) "
    "select e.event_id, e.user_id, e.value, "
    "abs(e.value - med.m) > 3 * 1.4826 * mad.d as is_outlier "
    "from events e join med on e.user_id = med.user_id "
    "join mad on e.user_id = mad.user_id order by e.event_id",
    "WITH med AS (SELECT user_id, "
    "round(quantile_cont(value, 0.5), 4) AS m FROM events GROUP BY user_id), "
    "mad AS (SELECT e.user_id, "
    "round(quantile_cont(abs(e.value - med.m), 0.5), 4) AS d "
    "FROM events e JOIN med ON e.user_id = med.user_id "
    "GROUP BY e.user_id) "
    "SELECT e.event_id, e.user_id, e.value, "
    "abs(e.value - med.m) > 3 * 1.4826 * mad.d AS is_outlier "
    "FROM events e JOIN med ON e.user_id = med.user_id "
    "JOIN mad ON e.user_id = mad.user_id ORDER BY e.event_id",
    "robust per-user outlier flags (median/MAD, 3-sigma-equivalent "
    "threshold) — heavy-tail-safe companion to ts_anomaly",
)

_reg_sql(
    "ts_anomaly",
    # Per-user z-score anomaly flags with EXACT cross-engine bits: the
    # mean/variance come from DECIMAL-exact sums (sum v and sum v²),
    # so mu, sd, and the |v - mu| > 2sd comparison evaluate the same
    # IEEE expression tree in both engines — no rounding, no tolerance.
    # Two shuffles (per-user moments, broadcast-sized stats join back).
    # The streaming twin would keep (n, sv, sv2) as mergeable state.
    "with s as (select user_id, count(*) as n, "
    "cast(sum(cast(value as decimal(18,2))) as double) as sv, "
    "cast(sum(cast(value as decimal(18,2)) * cast(value as decimal(18,2)))"
    " as double) as sv2 from events group by user_id), "
    "m as (select user_id, n, sv / n as mu, "
    "sqrt(greatest((sv2 - sv * sv / n) / (n - 1), 0)) as sd "
    "from s where n >= 2) "
    "select e.event_id, e.user_id, e.value, "
    "abs(e.value - m.mu) > 2 * m.sd as is_anomaly "
    "from events e join m on e.user_id = m.user_id order by e.event_id",
    None,  # identical SQL runs on DuckDB
    "per-user z-score anomaly flags (mean/std from decimal-exact "
    "moment sums — bit-identical across engines, no tolerance)",
)

_reg_sql(
    "txt_char_entropy",
    # Character-level Shannon entropy per doc — the gibberish /
    # base64-blob detector quality signal (natural text sits ~4 bits,
    # uniform noise near log2(alphabet)). Positional explode differs
    # by dialect; round(4) absorbs the summation-order last-ulp of
    # the ~30-term -sum(p log2 p).
    # length(text) > 0 guard: Spark's sequence(1, 0) steps DOWN and
    # yields [1, 0] (two bogus positions) where DuckDB's
    # generate_series(1, 0) is empty — empty docs must be excluded
    # identically on both sides or they hash-diverge.
    "with ch as (select doc_id, substr(text, p, 1) as c from ("
    "select doc_id, text, explode(sequence(1, length(text))) as p "
    "from documents where length(text) > 0)), "
    "counts as (select doc_id, c, count(*) as cnt from ch "
    "group by doc_id, c), "
    "tot as (select doc_id, cast(sum(cnt) as double) as nn from counts "
    "group by doc_id) "
    "select t.doc_id, round(-sum((cnt / nn) * log2(cnt / nn)), 4) "
    "as entropy from counts c join tot t on c.doc_id = t.doc_id "
    "group by t.doc_id order by t.doc_id",
    "WITH ch AS (SELECT doc_id, substr(text, p, 1) AS c FROM ("
    "SELECT doc_id, text, unnest(generate_series(1, length(text))) AS p "
    "FROM documents WHERE length(text) > 0)), "
    "counts AS (SELECT doc_id, c, count(*) AS cnt FROM ch "
    "GROUP BY doc_id, c), "
    "tot AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS nn FROM counts "
    "GROUP BY doc_id) "
    "SELECT t.doc_id, round(-sum((cnt / nn) * log2(cnt / nn)), 4) "
    "AS entropy FROM counts c JOIN tot t ON c.doc_id = t.doc_id "
    "GROUP BY t.doc_id ORDER BY t.doc_id",
    "character-level Shannon entropy per doc (gibberish/base64 "
    "detector; ~4 bits for natural text)",
)

_reg_sql(
    "x_scd2_intervals",
    "select user_id, event_type, event_id, ts as valid_from, "
    "lead(ts) over (partition by user_id order by ts, event_id) as valid_to, "
    "lead(ts) over (partition by user_id order by ts, event_id) is null as is_current "
    "from events",
    "SELECT user_id, event_type, event_id, ts AS valid_from, "
    "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to, "
    "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current "
    "FROM events",
    "SCD2 validity intervals from an event log (lead() closes each "
    "row's interval; NULL valid_to marks the current version) — one "
    "shuffle on user_id, the standard dimension-history build",
)


def _txt_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-BPE token counts: distributed word-count -> driver merge
    loop on the vocab-bounded frequency table -> Arrow-batched
    tokenizer. The corpus pass is one shuffle; the UDF is the
    sanctioned slow path (data-dependent merge loop has no Catalyst
    expression)."""
    from .functions.bpe import bpe_token_count_col, learn_bpe

    docs = _docs(spark, sf_dir)
    merges = learn_bpe(docs, "text", n_merges=50)
    return docs.select(
        "doc_id", bpe_token_count_col(F.col("text"), merges).alias("n_bpe_learned")
    )


_reg(
    "txt_bpe_tokens",
    _txt_bpe,
    None,  # learned merges + UDF application not SQL-expressible;
    # tests/test_bpe.py gates learning determinism and encode parity;
    # txt_bpe_roundtrip is the driver-scoreable certificate
    "learned BPE token counts (distributed counts, driver merges on "
    "the bounded vocab table, Arrow-batched apply)",
)


def _txt_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE lossless-roundtrip CERTIFICATE: for every document, the
    concatenation of its learned-BPE tokens with ``</w>`` end-of-word
    markers restored to spaces must equal the normalized (lowercased,
    whitespace-collapsed) text. BPE merges only ever concatenate
    adjacent symbols, so this invariant holding over the whole corpus
    certifies the full learn → broadcast-merges → Arrow-apply machinery
    preserved every byte. The oracle pins (n_docs, all_roundtrip=true):
    the count is data-derived, the flag is the property."""
    from .functions.bpe import bpe_tokenize_col, learn_bpe

    docs = _docs(spark, sf_dir)
    merges = learn_bpe(docs, "text", n_merges=100)
    toks = docs.select(
        "doc_id",
        "text",
        bpe_tokenize_col(F.col("text"), merges).alias("toks"),
    )
    detok = F.trim(F.regexp_replace(F.concat_ws("", "toks"), "</w>", " "))
    norm = F.concat_ws(" ", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    return toks.select((detok == norm).alias("ok")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("ok").alias("all_roundtrip"),
    )


_reg(
    "txt_bpe_roundtrip",
    _txt_bpe_roundtrip,
    "SELECT count(*)::BIGINT AS n_docs, true AS all_roundtrip FROM documents",
    "learned-BPE roundtrip certificate: detokenized output must equal "
    "normalized input for every document (oracle pins the flag + count)",
)


_reg_sql(
    "x_sessionize",
    # gap-based sessionization: a >30-min silence starts a new session.
    # One shuffle on user_id shared by both windows; session ids are
    # (user, cumulative-new-session-count) - deterministic, engine-
    # portable, and the canonical pre-aggregation for behavioral
    # analytics at scale (st_session is the streaming twin).
    "with gaps as (select user_id, event_id, ts, "
    "case when lag(ts) over (partition by user_id order by ts, event_id) is null "
    "or ts - lag(ts) over (partition by user_id order by ts, event_id) "
    "> interval 30 minutes then 1 else 0 end as is_new from events) "
    "select user_id, cast(sum(is_new) over (partition by user_id "
    "order by ts, event_id rows unbounded preceding) as bigint) as session_seq, "
    "event_id, ts from gaps",
    "WITH gaps AS (SELECT user_id, event_id, ts, "
    "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "> INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new FROM events) "
    "SELECT user_id, CAST(sum(is_new) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq, "
    "event_id, ts FROM gaps",
    "gap-based sessionization (30-min inactivity closes a session): "
    "lag + running sum over one user_id shuffle",
)

_reg_sql(
    "x_cohort_retention",
    # Classic cohort-retention matrix: users grouped by first-seen
    # week, distinct-active counts at each week offset. Both engines
    # Monday-truncate weeks, and the offset is an exact multiple of 7
    # days, so `days/7.0 -> int` is bit-safe. Two user_id-keyed
    # shuffles (first-seen, activity) + one grouped count-distinct;
    # at 100 TB the cohort table persists and each new week appends
    # one activity slice — the incremental analytics shape.
    "with f as (select user_id, cast(date_trunc('week', min(ts)) as date) "
    "as cohort_week from events group by user_id), "
    "a as (select distinct user_id, cast(date_trunc('week', ts) as date) "
    "as active_week from events) "
    "select f.cohort_week, "
    "cast(datediff(a.active_week, f.cohort_week) / 7.0 as int) as week_offset, "
    "cast(count(distinct a.user_id) as bigint) as n_active "
    "from a join f on a.user_id = f.user_id "
    "group by f.cohort_week, week_offset "
    "order by cohort_week, week_offset",
    "WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) "
    "AS cohort_week FROM events GROUP BY user_id), "
    "a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) "
    "AS active_week FROM events) "
    "SELECT f.cohort_week, "
    "CAST(date_diff('day', f.cohort_week, a.active_week) / 7.0 AS INT) "
    "AS week_offset, "
    "CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active "
    "FROM a JOIN f ON a.user_id = f.user_id "
    "GROUP BY f.cohort_week, week_offset "
    "ORDER BY cohort_week, week_offset",
    "cohort retention matrix: first-seen-week cohorts x distinct "
    "active users per week offset — the incremental event-analytics "
    "shape",
)

_reg_sql(
    "x_funnel",
    # ordered-funnel analysis: earliest view -> first later click ->
    # first later purchase per user. Each stage is a grouped min over
    # a semi-filtered self-join; all joins key on user_id (one
    # partitioning reused), stage tables shrink monotonically so AQE
    # broadcasts them against the event scan.
    "with v as (select user_id, min(ts) as t_view from events "
    "where event_type = 'view' group by user_id), "
    "c as (select e.user_id, min(e.ts) as t_click from events e "
    "join v on e.user_id = v.user_id and e.ts > v.t_view "
    "where e.event_type = 'click' group by e.user_id), "
    "p as (select e.user_id, min(e.ts) as t_purchase from events e "
    "join c on e.user_id = c.user_id and e.ts > c.t_click "
    "where e.event_type = 'purchase' group by e.user_id) "
    "select v.user_id, v.t_view, c.t_click, p.t_purchase "
    "from v left join c on v.user_id = c.user_id "
    "left join p on v.user_id = p.user_id",
    "WITH v AS (SELECT user_id, min(ts) AS t_view FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e "
    "JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view "
    "WHERE e.event_type = 'click' GROUP BY e.user_id), "
    "p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e "
    "JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click "
    "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
    "SELECT v.user_id, v.t_view, c.t_click, p.t_purchase "
    "FROM v LEFT JOIN c ON v.user_id = c.user_id "
    "LEFT JOIN p ON v.user_id = p.user_id",
    "ordered funnel (view -> click -> purchase): stage-wise grouped "
    "minima over user_id-keyed joins, NULLs mark drop-off",
)

_reg_sql(
    "f_variant_json",
    "select event_id, "
    "variant_get(parse_json(props), '$.k', 'int') as k_val, "
    "is_variant_null(try_parse_json(props)) as bad_json "
    "from events where event_id < 200",
    "SELECT event_id, "
    "json_extract(props, '$.k')::INT AS k_val, "
    "FALSE AS bad_json "
    "FROM events WHERE event_id < 200",
    "semi-structured VARIANT path (Spark 4): parse once into the binary "
    "variant encoding, then typed path extraction — at scale this beats "
    "per-access JSON string re-parsing (f_json_funcs is the string path)",
)


_reg_sql(
    "a_bool_aggs",
    "select l_returnflag, "
    # BIGINT cast: DuckDB's count_if widens to HUGEINT, which pandas
    # materializes as float64 (1041.0 vs Spark's 1041) — same driver
    # value-hash divergence class as tpch_q12's sum(case ...)
    "cast(count_if(l_quantity > 25) as bigint) as n_big, "
    "bool_and(l_quantity > 0) as all_pos, "
    "bool_or(l_discount > 0.09) as any_deep_disc "
    "from lineitem group by l_returnflag",
    None,  # identical SQL runs on DuckDB
    "boolean/conditional aggregates (count_if, bool_and, bool_or) — "
    "single-pass data-quality assertions over a group",
)


_reg_sql(
    "f_timezone",
    "select event_id, "
    "from_utc_timestamp(ts, 'America/New_York') as ny, "
    "from_utc_timestamp(ts, 'Asia/Tokyo') as tokyo, "
    "hour(from_utc_timestamp(ts, 'America/New_York')) as ny_hour "
    "from events where event_id < 300",
    "SELECT event_id, "
    "timezone('America/New_York', timezone('UTC', ts)) AS ny, "
    "timezone('Asia/Tokyo', timezone('UTC', ts)) AS tokyo, "
    "hour(timezone('America/New_York', timezone('UTC', ts))) AS ny_hour "
    "FROM events WHERE event_id < 300",
    "timezone conversion (DST-aware, via the tz database) — the DuckDB "
    "side pins the instant with an inner timezone('UTC', ...) so the "
    "oracle is independent of the session timezone",
)


def _pivot_dynamic(
    spark: SparkSession, sf_dir: str, max_columns: int = 10_000
) -> DataFrame:
    """Dynamic pivot: the column set is discovered from the data (a
    bounded dimension — the distinct() collect is ≤ cardinality rows,
    never fact-sized), then one shuffle pivots. Passing the explicit
    value list lets Spark skip its own discovery pass.

    ``max_columns`` guards the driver: pivoting on an unbounded-
    cardinality column would both OOM the collect and produce an
    unusable million-column frame, so fail fast instead. The limit+1
    fetch means the driver never holds more than max_columns+1 rows
    regardless of the true cardinality.
    """
    from pyspark.sql import functions as F

    ev = engine_for(spark, sf_dir).spark.table("events")
    distinct_types = ev.select("event_type").distinct().limit(max_columns + 1).collect()
    if len(distinct_types) > max_columns:
        raise ValueError(
            f"pivot column cardinality exceeds max_columns={max_columns}; "
            "pivot on a bounded dimension or raise the limit explicitly"
        )
    types = sorted(r[0] for r in distinct_types)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
        )
    )


_reg(
    "x_pivot_dynamic",
    _pivot_dynamic,
    "SELECT user_id, "
    + ", ".join(
        f"cast(sum(cast(CASE WHEN event_type = '{t}' THEN value END "
        f"as decimal(18,2))) as double) AS {t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    + " FROM events GROUP BY user_id",
    "dynamic pivot (column set discovered from data, then explicit-list "
    "pivot; x_pivot is the static-list form)",
)


_reg_sql(
    "txt_chunks",
    "select doc_id, chunk_idx, substr(text, chunk_idx * 80 + 1, 100) as chunk "
    "from (select doc_id, text, "
    "posexplode(sequence(0, greatest(0, "
    "cast(ceil((n_chars - 100) / 80.0) as int)))) as (pos, chunk_idx) "
    "from documents) t where doc_id < 100",
    "SELECT doc_id, chunk_idx, substr(text, chunk_idx * 80 + 1, 100) AS chunk "
    "FROM (SELECT doc_id, text, "
    "unnest(generate_series(0, greatest(0, "
    "cast(ceil((n_chars - 100) / 80.0) as int)))) AS chunk_idx "
    "FROM documents) t WHERE doc_id < 100",
    "overlapping document chunking (window 100 chars, stride 80) — the "
    "RAG / context-window prep op; fan-out is explode over a generated "
    "index, fully JVM-side, parallelism follows the documents scan",
)


# DuckDB oracle shared by both winnowing formulations (window shape).
_WINNOW_ORACLE = (
    "SELECT DISTINCT doc_id, fp FROM ("
    "SELECT doc_id, pos, m, "
    "min(kh) OVER (PARTITION BY doc_id ORDER BY pos "
    "ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS fp "
    "FROM (SELECT doc_id, pos, m, "
    "substr(md5(substr(text, pos, 8)), 1, 8) AS kh "
    "FROM (SELECT doc_id, text, greatest(1, n_chars - 7) AS m, "
    "unnest(generate_series(1, greatest(1, n_chars - 7))) AS pos "
    "FROM documents) g) h) w "
    "WHERE pos >= least(16, m)"
)

_reg_sql(
    "txt_winnow_fingerprint",
    # Winnowing (MOSS-style) document fingerprinting — the rolling-hash
    # fingerprint op: hash every k-gram (k=8; md5-hex prefix so both
    # engines agree bit-for-bit), then keep the minimum hash of each
    # sliding window of w=16 consecutive k-grams; the distinct minima
    # are the document's fingerprints. Guarantees any shared substring
    # of length >= w+k-1 between two documents yields a shared
    # fingerprint, robust to position shifts (unlike fixed chunking).
    # All JVM-side: explode over a generated position index (fan-out is
    # n_chars rows/doc, partition-local), one window shuffle on doc_id.
    # Idle-host A/B at sf0.1: this shape 3.2 s vs 4.6 s for the
    # map-only array formulation below — codegen'd window MIN beats
    # interpreted slice+array_min lambdas while shuffles are local.
    # txt_winnow_maponly is the same op with zero exchanges for the
    # cluster case where the corpus-wide window shuffle dominates.
    "select distinct doc_id, fp from ("
    "select doc_id, pos, m, "
    "min(kh) over (partition by doc_id order by pos "
    "rows between 15 preceding and current row) as fp "
    "from (select doc_id, pos, m, "
    "substr(md5(substr(text, pos, 8)), 1, 8) as kh "
    "from (select doc_id, text, greatest(1, n_chars - 7) as m, "
    "posexplode(sequence(1, greatest(1, n_chars - 7))) as (i, pos) "
    "from documents) g) h) w "
    "where pos >= least(16, m)",
    _WINNOW_ORACLE,
    "winnowing fingerprint (k-gram rolling hash + sliding-window min): "
    "shared substrings of length >= 23 chars always share a "
    "fingerprint; the plagiarism/near-dup detection primitive "
    "complementing MinHash (set-overlap) and SimHash (vector distance)",
)

_reg_sql(
    "txt_winnow_maponly",
    # ZERO-SHUFFLE winnowing: identical output to
    # txt_winnow_fingerprint (same oracle), different plan. The k-gram
    # hash array is built once per document, window minima come from
    # transform+slice+array_min over that array, and array_distinct
    # collapses repeats before the only explode — which fans out just
    # the surviving fingerprints (~n/w rows) instead of n_chars rows,
    # and NOTHING is exchanged: a pure map pass. Locally this is ~1.4×
    # slower than the window form (4.6 s vs 3.2 s at sf0.1 — codegen'd
    # window MIN vs interpreted lambdas; both rescan each frame since
    # MIN admits no decremental update), but it removes the only
    # corpus-wide shuffle, which is the term that grows with cluster
    # size — the formulation to pick when the exchange, not CPU, is
    # the bottleneck. Word shingles instead of chars cut the per-doc
    # fan-out a further ~5×.
    "select doc_id, fp from ("
    "select doc_id, explode(array_distinct(transform("
    "sequence(least(16, m), m), "
    "p -> array_min(slice(khs, greatest(1, p - 15), least(16, p)))))) as fp "
    "from (select doc_id, m, "
    "transform(sequence(1, m), "
    "q -> substr(md5(substr(text, q, 8)), 1, 8)) as khs "
    "from (select doc_id, text, greatest(1, n_chars - 7) as m "
    "from documents) g) h) w",
    _WINNOW_ORACLE,
    "zero-exchange winnowing (array-side sliding minima, map-only "
    "plan) — same fingerprints as txt_winnow_fingerprint, traded for "
    "the corpus-wide window shuffle",
)


_reg(
    "x_temperature_mix",
    # Temperature-based source rebalancing (p_s ∝ n_s^τ, the XLM-R
    # multilingual-sampling recipe) at τ=0.5: acceptance reduces in
    # closed form to sqrt(n_min)/sqrt(n_s) — smallest source kept
    # whole, normalization cancels algebraically. sqrt and division
    # are correctly-rounded IEEE ops, so the oracle writing the SAME
    # two ops reproduces the md5 hex thresholds bit-identically.
    lambda spark, sf_dir: __import__(
        "dataframe_sql_spark.operators.sampling", fromlist=["temperature_mix"]
    ).temperature_mix(_docs(spark, sf_dir), "doc_id", "lang", tau=0.5, seed=42)
    .select("doc_id", "lang", "source"),
    "WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang), "
    "m AS (SELECT min(cnt) AS mn FROM c), "
    "f AS (SELECT lang, least(1.0, sqrt(mn) / sqrt(cnt)) AS frac "
    "FROM c CROSS JOIN m), "
    "t AS (SELECT lang, CASE WHEN frac >= 1.0 THEN 'g' "
    "ELSE printf('%08x', CAST(floor(frac * 4294967296.0) AS BIGINT)) END AS thr "
    "FROM f) "
    "SELECT d.doc_id, d.lang, d.source FROM documents d JOIN t ON d.lang = t.lang "
    "WHERE substr(md5(d.doc_id || ':42'), 1, 8) < t.thr",
    "temperature-based source rebalancing (p ∝ n^τ, τ=0.5): smallest "
    "source kept whole, larger sources downsampled toward balance — "
    "closed-form sqrt fractions, bit-identical cross-engine",
)

_MIX_WEIGHTS = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}

_reg(
    "x_dataset_mix",
    lambda spark, sf_dir: dataset_mix(
        _docs(spark, sf_dir), "doc_id", "lang", _MIX_WEIGHTS, seed=42
    ).select("doc_id", "lang", "source"),
    # Oracle recomputes the feasible total T = min(count/weight), the
    # per-source acceptance fractions, and the same md5 hex-threshold
    # decision — every float op written in the same order as the Python
    # driver code so the doubles (and hence the thresholds) are
    # bit-identical. printf('%08x', floor(frac * 16^8)) reproduces
    # hex_threshold for frac < 1; the binding source gets 'g' (above
    # all hex) exactly like hex_threshold(1.0).
    "WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang), "
    "w(lang, wt) AS (VALUES ('en', 0.4), ('de', 0.15), ('es', 0.15), "
    "('fr', 0.15), ('zh', 0.15)), "
    "f AS (SELECT c.lang, least(1.0, "
    "(SELECT min(c2.cnt / w2.wt) FROM c c2 JOIN w w2 ON c2.lang = w2.lang) "
    "* w.wt / c.cnt) AS frac FROM c JOIN w ON c.lang = w.lang), "
    "t AS (SELECT lang, CASE WHEN frac >= 1.0 THEN 'g' "
    "ELSE printf('%08x', CAST(floor(frac * 4294967296.0) AS BIGINT)) END AS thr "
    "FROM f) "
    "SELECT d.doc_id, d.lang, d.source FROM documents d JOIN t ON d.lang = t.lang "
    "WHERE substr(md5(d.doc_id || ':42'), 1, 8) < t.thr",
    "dataset mixing: downsample each source to hit a target mixture at "
    "max feasible volume (binding source kept whole); hash-based and "
    "map-side after one bounded source-count aggregate",
)

_reg(
    "x_global_shuffle",
    lambda spark, sf_dir: global_shuffle(
        _docs(spark, sf_dir).select("doc_id", "source"), "doc_id", seed=42
    ),
    # The oracle is the naive single-sort formulation; the Spark side
    # computes the identical permutation with the parallel
    # bucket-rank + offset decomposition (see sampling.global_shuffle).
    "SELECT doc_id, source, row_number() OVER "
    "(ORDER BY md5(doc_id || ':42'), doc_id) AS shuffle_pos FROM documents",
    "deterministic global training-order shuffle rank, computed as "
    "parallel within-bucket row_number + tiny broadcast bucket offsets "
    "instead of a single-partition global sort",
)


_reg_sql(
    "emb_quantize_int8",
    # Symmetric per-vector int8 quantization: scale = max |x| (double),
    # q_i = floor(x_i / scale * 127). 4x storage reduction for ANN
    # indexes; dequantize as q * scale / 127. floor (not round) keeps
    # the op bit-identical across engines (no rounding-mode edge), and
    # float32 -> double casts are exact so the arithmetic matches.
    # Everything is a higher-order JVM expression over the array column
    # - one map-side projection, no shuffle, no UDF.
    "select vec_id, label, scale, "
    "transform(emb_d, x -> cast(floor(x / scale * 127.0) as int)) as q "
    "from (select vec_id, label, "
    "transform(embedding, x -> cast(x as double)) as emb_d, "
    "aggregate(embedding, cast(0.0 as double), "
    "(a, x) -> greatest(a, abs(cast(x as double)))) as scale "
    "from embeddings) t where scale > 0",
    "SELECT vec_id, label, scale, "
    "list_transform(emb_d, x -> CAST(floor(x / scale * 127.0) AS INT)) AS q "
    "FROM (SELECT vec_id, label, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb_d, "
    "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale "
    "FROM embeddings) t WHERE scale > 0",
    "per-vector symmetric int8 embedding quantization (scale = max "
    "abs); the storage-compression step before building a 100 TB ANN "
    "index - map-side higher-order expressions, no UDF",
)


def _dd_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span duplication measurement (Lee et al. 2022
    shape): corpus-duplicated word 5-grams mark spans; per-doc coverage
    ratio of the span union. Spark grams are hashes of word-hash
    windows; the oracle re-derives the same equivalence classes from
    the literal word strings (whitespace-split words make the ' '
    join unambiguous)."""
    from .operators.dedup import substring_span_stats

    docs = engine_for(spark, sf_dir).spark.table("documents")
    return substring_span_stats(docs, "doc_id", "text", k=5)


_reg(
    "dd_substring_spans",
    _dd_substring,
    r"WITH words AS (SELECT doc_id, "
    r"string_split_regex(trim(lower(text)), '\s+') AS w FROM documents), "
    r"pos AS (SELECT doc_id, w, "
    r"unnest(generate_series(1, greatest(len(w) - 4, 1))) AS pos FROM words), "
    r"grams AS (SELECT doc_id, pos, "
    r"w[pos] || ' ' || w[least(pos+1, len(w))] || ' ' || "
    r"w[least(pos+2, len(w))] || ' ' || w[least(pos+3, len(w))] || ' ' || "
    r"w[least(pos+4, len(w))] AS g FROM pos), "
    r"dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2), "
    r"dpos AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dupg)), "
    r"cov AS (SELECT doc_id, count(*) AS dup_grams, "
    r"sum(CASE WHEN nxt IS NULL THEN 5 ELSE least(5, nxt - pos) END) AS covered "
    r"FROM (SELECT doc_id, pos, lead(pos) OVER "
    r"(PARTITION BY doc_id ORDER BY pos) AS nxt FROM dpos) t GROUP BY doc_id), "
    r"nt AS (SELECT doc_id, "
    r"len(string_split_regex(trim(lower(text)), '\s+'))::BIGINT AS n_tokens "
    r"FROM documents) "
    r"SELECT nt.doc_id, n_tokens, "
    r"coalesce(dup_grams, 0)::BIGINT AS dup_grams, "
    r"least(coalesce(covered, 0), n_tokens)::BIGINT AS covered_tokens, "
    r"least(coalesce(covered, 0), n_tokens)::DOUBLE / greatest(n_tokens, 1) "
    r"AS dup_ratio FROM nt LEFT JOIN cov ON nt.doc_id = cov.doc_id",
    "exact substring-span dedup measurement: corpus-duplicated 5-grams "
    "-> per-doc covered-span ratio (interval union via one window); "
    "the only corpus-wide shuffle is a 16-byte/row gram count",
)


def _dd_substring_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import substring_span_remove

    return substring_span_remove(_docs(spark, sf_dir), "doc_id", "text").orderBy(
        "doc_id"
    )


_reg(
    "dd_substring_remove",
    _dd_substring_remove,
    # Same gram construction as the dd_substring_spans oracle; keep-one
    # = global first occurrence per gram by (doc_id, pos).
    r"WITH words AS (SELECT doc_id, "
    r"string_split_regex(trim(lower(text)), '\s+') AS w FROM documents), "
    r"pos AS (SELECT doc_id, w, "
    r"unnest(generate_series(1, greatest(len(w) - 4, 1))) AS pos FROM words), "
    r"grams AS (SELECT doc_id, pos, "
    r"w[pos] || ' ' || w[least(pos+1, len(w))] || ' ' || "
    r"w[least(pos+2, len(w))] || ' ' || w[least(pos+3, len(w))] || ' ' || "
    r"w[least(pos+4, len(w))] AS g FROM pos), "
    r"occ AS (SELECT doc_id, pos, row_number() OVER "
    r"(PARTITION BY g ORDER BY doc_id, pos) AS rn FROM grams), "
    r"cov AS (SELECT DISTINCT doc_id, pos + o.o AS p FROM occ "
    r"CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS o) o "
    r"WHERE rn > 1), "
    r"tok AS (SELECT doc_id, w, "
    r"unnest(generate_series(1, len(w))) AS p FROM words), "
    r"tok2 AS (SELECT doc_id, p, w[p] AS word FROM tok), "
    r"kept AS (SELECT t.doc_id, t.p, t.word FROM tok2 t "
    r"LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p "
    r"WHERE c.p IS NULL), "
    r"reb AS (SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS clean_text, "
    r"count(*) AS n FROM kept GROUP BY doc_id) "
    r"SELECT d.doc_id, coalesce(reb.clean_text, '') AS clean_text, "
    r"coalesce(reb.n, 0)::BIGINT AS kept_tokens "
    r"FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id "
    r"ORDER BY d.doc_id",
    "exact substring-span REMOVAL (keep-one policy: globally first "
    "occurrence per duplicated 5-gram survives; covered spans cut, "
    "text rebuilt) — the action behind dd_substring_spans' measurement",
)


def _dd_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: drop training docs sharing any exact
    word 8-gram with the benchmark set (docs < 50 stand in for the
    eval suite). The overlap check is a semi-join on fixed-width gram
    hashes; the benchmark gram set is tiny so AQE broadcasts it — at
    100 TB the scan side streams, nothing corpus-sized shuffles."""
    from .operators.dedup import kgram_positions

    docs = engine_for(spark, sf_dir).spark.table("documents")
    bench = docs.filter("doc_id < 50")
    train = docs.filter("doc_id >= 50")
    bench_grams = kgram_positions(bench, "doc_id", "text", k=8).select("gh").distinct()
    hit = (
        kgram_positions(train, "doc_id", "text", k=8)
        .join(bench_grams, on="gh", how="left_semi")
        .select("doc_id")
        .distinct()
    )
    return train.join(hit, on="doc_id", how="left_anti").select(
        "doc_id", "lang", "source"
    )


_reg(
    "dd_decontaminate",
    _dd_decontaminate,
    r"WITH words AS (SELECT doc_id, "
    r"string_split_regex(trim(lower(text)), '\s+') AS w FROM documents), "
    r"grams AS (SELECT doc_id, "
    r"w[pos] || ' ' || w[least(pos+1, len(w))] || ' ' || "
    r"w[least(pos+2, len(w))] || ' ' || w[least(pos+3, len(w))] || ' ' || "
    r"w[least(pos+4, len(w))] || ' ' || w[least(pos+5, len(w))] || ' ' || "
    r"w[least(pos+6, len(w))] || ' ' || w[least(pos+7, len(w))] AS g "
    r"FROM (SELECT doc_id, w, "
    r"unnest(generate_series(1, greatest(len(w) - 7, 1))) AS pos FROM words) p), "
    r"bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 50), "
    r"hit AS (SELECT DISTINCT doc_id FROM grams "
    r"WHERE doc_id >= 50 AND g IN (SELECT g FROM bench)) "
    r"SELECT doc_id, lang, source FROM documents "
    r"WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM hit)",
    "test-set decontamination: drop training docs sharing any exact "
    "8-gram with the benchmark table (GPT-3-style n-gram overlap); "
    "gram-hash semi-join, benchmark side broadcast",
)


_reg_sql(
    "txt_word_rarity",
    # corpus-statistics quality scoring (CCNet-style, integer-exact):
    # per-doc mean corpus frequency of its words + share of rare
    # (freq<=2) words. Both outputs are ratios of exact integer
    # aggregates, so the cross-engine hash matches bit-for-bit without
    # any float-sum ordering concerns.
    "with words as (select doc_id, "
    "explode(split(trim(lower(text)), '\\\\s+')) as w from documents), "
    "freq as (select w, count(*) as c from words group by w) "
    # BIGINT cast on freq_sum: DuckDB sum(BIGINT) widens to HUGEINT ->
    # pandas float64 -> driver value-hash mismatch (q12 class)
    "select doc_id, count(*) as n_words, cast(sum(c) as bigint) as freq_sum, "
    "cast(sum(c) as double) / count(*) as avg_word_freq, "
    "cast(sum(case when c <= 2 then 1 else 0 end) as double) / count(*) "
    "as rare_ratio "
    "from words join freq using (w) group by doc_id",
    r"WITH words AS (SELECT doc_id, "
    r"unnest(string_split_regex(trim(lower(text)), '\s+')) AS w FROM documents), "
    r"freq AS (SELECT w, count(*) AS c FROM words GROUP BY w) "
    r"SELECT doc_id, count(*) AS n_words, sum(c)::BIGINT AS freq_sum, "
    r"sum(c)::DOUBLE / count(*) AS avg_word_freq, "
    r"sum(CASE WHEN c <= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*) "
    r"AS rare_ratio "
    r"FROM words JOIN freq USING (w) GROUP BY doc_id",
    "corpus-statistics quality score: per-doc mean word frequency and "
    "rare-word share; the freq table is vocab-sized so the join "
    "broadcasts - the unigram half of a CCNet-style quality filter",
)


def _dd_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: docs < 250 are the already-indexed corpus;
    the 250+ batch is deduped against their band index + itself."""
    from .operators.dedup import incremental_minhash_dedup, minhash_band_index

    docs = engine_for(spark, sf_dir).spark.table("documents")
    hist = docs.filter("doc_id < 250")
    new = docs.filter("doc_id >= 250")
    index = minhash_band_index(hist, "doc_id", "text")
    kept, _delta = incremental_minhash_dedup(new, index, "doc_id", "text")
    return kept.select("doc_id", "lang", "source")


_reg(
    "dd_incremental",
    _dd_incremental,
    None,  # rows-only: LSH banding is not SQL-expressible; semantics
    # gated by tests/test_dedup.py::test_incremental_dedup_against_index
    "incremental near-dup: new batch vs persisted MinHash band index "
    "(the 100 TB ingest shape - history is never re-signatured)",
)


# --------------------------------------------------------------------------
# corpus-curation round 3 additions: per-source quality quantiles,
# embedding whitening, length histograms, curriculum ordering
# --------------------------------------------------------------------------

_reg_sql(
    "x_quality_topq",
    # FineWeb-style per-domain quality-quantile filter: rank documents
    # within each source by a quality proxy (token count here; swap in
    # quality_score for production) and keep the top half. percent_rank
    # is (rank-1)/(n-1) — exact small rationals, so the 0.5 cutoff is
    # engine-stable; the doc_id tiebreak makes the ordering total. One
    # shuffle on source (the window), no global sort.
    r"select doc_id, source, n_words from ("
    r"select doc_id, source, n_words, "
    r"percent_rank() over (partition by source "
    r"order by n_words desc, doc_id) as pr "
    r"from (select doc_id, source, "
    r"size(split(trim(text), '\\s+')) as n_words from documents) t) r "
    r"where pr <= 0.5",
    r"SELECT doc_id, source, n_words FROM ("
    r"SELECT doc_id, source, n_words, "
    r"percent_rank() OVER (PARTITION BY source "
    r"ORDER BY n_words DESC, doc_id) AS pr "
    r"FROM (SELECT doc_id, source, "
    r"length(string_split_regex(trim(text), '\s+')) AS n_words "
    r"FROM documents) t) r "
    r"WHERE pr <= 0.5",
    "per-source quality-quantile filter (keep top 50% per domain) — "
    "the FineWeb/DCLM curation shape: quantiles computed within each "
    "domain so no single domain's distribution dominates the cut",
)

_reg_sql(
    "emb_standardize",
    # Per-dimension z-score whitening of the embedding corpus — the
    # feature-normalization pass before clustering / ANN training.
    # Exploded output (vec_id, dim, z) so both engines express the
    # same computation without array reconstruction; the window over
    # dim is one 64-partition shuffle. round(4) absorbs the engines'
    # different float summation orders (relative error ~1e-13 on 500
    # values). At 100 TB compute the 64 (mean, std) pairs with a
    # single agg + broadcast instead of a window: same math, and the
    # stats table is 64 rows regardless of corpus size.
    # "+ 0" canonicalizes IEEE negative zero (round can yield -0.0,
    # which hashes differently from 0.0 on the driver's value path)
    "select vec_id, dim, "
    "round((x - avg(x) over (partition by dim)) / "
    "nullif(stddev_pop(x) over (partition by dim), 0), 4) + 0 as z "
    "from (select vec_id, dim, cast(xf as double) as x "
    "from (select vec_id, posexplode(embedding) as (dim, xf) "
    "from embeddings) g) e",
    "WITH e AS (SELECT vec_id, r.range AS dim, "
    "CAST(embedding[r.range + 1] AS DOUBLE) AS x "
    "FROM embeddings, range(64) r) "
    "SELECT vec_id, dim, "
    "round((x - avg(x) OVER (PARTITION BY dim)) / "
    "nullif(stddev_pop(x) OVER (PARTITION BY dim), 0), 4) + 0 AS z FROM e",
    "per-dimension z-score standardization of embeddings (whitening "
    "before clustering/quantization); exploded (vec_id, dim, z) shape "
    "keeps the oracle exact",
)

_reg_sql(
    "txt_len_histogram",
    # Token-length histogram with cumulative share — the
    # sequence-packing / batch-shape planning pass (how much of the
    # corpus fits a given context length). Two tiny aggregations; the
    # cumulative window runs over the bucket table (bounded rows:
    # max_len/10), not the corpus.
    r"with w as (select cast(floor(size(split(trim(text), '\\s+')) / 10.0) "
    r"* 10 as bigint) as bucket from documents), "
    r"b as (select bucket, count(*) as n_docs from w group by bucket) "
    r"select bucket, n_docs, "
    r"round(cast(sum(n_docs) over (order by bucket) as double) / "
    r"sum(n_docs) over (), 6) as cum_share from b",
    r"WITH w AS (SELECT CAST(floor(length(string_split_regex(trim(text), "
    r"'\s+')) / 10.0) * 10 AS BIGINT) AS bucket FROM documents), "
    r"b AS (SELECT bucket, count(*) AS n_docs FROM w GROUP BY bucket) "
    r"SELECT bucket, n_docs, "
    r"round(CAST(sum(n_docs) OVER (ORDER BY bucket) AS DOUBLE) / "
    r"sum(n_docs) OVER (), 6) AS cum_share FROM b",
    "token-length histogram (width-10 buckets) with cumulative corpus "
    "share — context-window fit planning for sequence packing",
)


def _x_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum ordering: every document gets a global
    training-sequence position (longest first, doc_id tiebreak) via the
    scale-safe two-pass rank (operators/rank.py) — a total order over
    the corpus with NO single-partition sort stage, which is how a
    curriculum schedule stays computable at 100 TB."""
    from .operators.rank import global_rank

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words")
    )
    return global_rank(
        docs, [("n_words", False), ("doc_id", True)], out_col="seq"
    )


_reg(
    "x_curriculum_order",
    _x_curriculum,
    r"SELECT doc_id, "
    r"length(string_split_regex(trim(text), '\s+')) AS n_words, "
    r"row_number() OVER (ORDER BY "
    r"length(string_split_regex(trim(text), '\s+')) DESC, doc_id) AS seq "
    r"FROM documents",
    "global curriculum ordering (longest-first, unique tiebreak) via "
    "the two-pass range-partitioned rank — no SinglePartition stage",
)


# --------------------------------------------------------------------------
# relevance & corpus-LM quality scoring (operators/relevance.py)
# --------------------------------------------------------------------------

# Shared tokenization CTE for the relevance oracles — same
# split(trim(lower)) convention as _SH_CTE so corpus statistics agree
# across the dedup and relevance families.
_W_CTE = (
    r"w0 AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), "
    r"'\s+')) AS word FROM documents), "
    r"wds AS (SELECT doc_id, word FROM w0 WHERE word <> '')"
)

# Bigram CTE: adjacent-word pairs via index transform (1-word docs
# yield a (word, NULL) pair, filtered — mirrors _bigram_frame).
_BG_CTE = (
    r"wsx AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') "
    r"AS ws FROM documents), "
    r"bg0 AS (SELECT doc_id, unnest(list_transform("
    r"range(1, greatest(len(ws) - 1, 1) + 1), "
    r"i -> {'w1': ws[i], 'w2': ws[i + 1]})) AS u FROM wsx), "
    r"bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM bg0 "
    r"WHERE u.w2 IS NOT NULL AND u.w1 <> '')"
)


def _txt_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relevance import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), "doc_id", "text", k=3)


_reg(
    "txt_tfidf",
    _txt_tfidf,
    "WITH "
    + _W_CTE
    + r", tf AS (SELECT doc_id, word, cast(count(*) AS BIGINT) AS tf "
    r"FROM wds GROUP BY doc_id, word), "
    r"dfq AS (SELECT word, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY word), "
    r"nd AS (SELECT count(*) AS n_docs FROM documents), "
    r"s AS (SELECT doc_id, word, tf, df, "
    r"round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score "
    r"FROM tf JOIN dfq USING (word) CROSS JOIN nd), "
    r"r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
    r"ORDER BY score DESC, word) AS rn FROM s) "
    r"SELECT doc_id, word, tf, df, score, rn FROM r WHERE rn <= 3",
    "top-3 TF-IDF terms per document (smooth idf, deterministic "
    "word tiebreak); exact BIGINT tf/df beside the rounded score",
)


def _txt_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relevance import bm25_scores

    return bm25_scores(
        _docs(spark, sf_dir), "doc_id", "text", ["table", "query", "spark"]
    )


_reg(
    "txt_bm25",
    _txt_bm25,
    "WITH "
    + _W_CTE
    + r", dl AS (SELECT doc_id, cast(count(*) AS BIGINT) AS dl "
    r"FROM wds GROUP BY doc_id), "
    r"c AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl), "
    r"tf AS (SELECT doc_id, word, cast(count(*) AS BIGINT) AS tf FROM wds "
    r"WHERE word IN ('table', 'query', 'spark') GROUP BY doc_id, word), "
    r"dfq AS (SELECT word, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY word), "
    r"pt AS (SELECT tf.doc_id, "
    r"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 / "
    r"(tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS wgt "
    r"FROM tf JOIN dfq USING (word) JOIN dl USING (doc_id) CROSS JOIN c) "
    r"SELECT doc_id, cast(count(*) AS BIGINT) AS n_terms_hit, "
    r"round(sum(wgt), 6) AS score FROM pt GROUP BY doc_id",
    "Okapi BM25 (k1=1.2, b=0.75) over a 3-term query; sparse 'scatter "
    "only what you score' retrieval shape",
)


def _txt_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relevance import pmi_bigrams

    return pmi_bigrams(_docs(spark, sf_dir), "doc_id", "text", min_count=5, top=50)


_reg(
    "txt_pmi",
    _txt_pmi,
    "WITH "
    + _W_CTE
    + ", "
    + _BG_CTE
    + r", bgf AS (SELECT w1, w2, cast(count(*) AS BIGINT) AS c_xy "
    r"FROM bg GROUP BY w1, w2), "
    r"uni AS (SELECT word, cast(count(*) AS BIGINT) AS c FROM wds GROUP BY word), "
    r"tot AS (SELECT (SELECT count(*) FROM bg) AS b_total, "
    r"(SELECT cast(sum(c) AS BIGINT) FROM uni) AS u_total) "
    r"SELECT w1, w2, c_xy, cx.c AS c_x, cy.c AS c_y, "
    r"round(ln((c_xy / b_total) / ((cx.c / u_total) * (cy.c / u_total))), 6) "
    r"AS pmi FROM bgf "
    r"JOIN uni cx ON bgf.w1 = cx.word JOIN uni cy ON bgf.w2 = cy.word "
    r"CROSS JOIN tot WHERE c_xy >= 5 "
    r"ORDER BY pmi DESC, w1, w2 LIMIT 50",
    "top-50 PMI collocations (min bigram count 5); exact BIGINT counts "
    "beside the rounded score",
)


def _txt_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relevance import bigram_lm_scores

    return bigram_lm_scores(_docs(spark, sf_dir), "doc_id", "text")


_reg(
    "txt_lm_score",
    _txt_lm_score,
    "WITH "
    + _W_CTE
    + ", "
    + _BG_CTE
    + r", c12 AS (SELECT w1, w2, cast(count(*) AS BIGINT) AS c12 "
    r"FROM bg GROUP BY w1, w2), "
    r"uni AS (SELECT word, cast(count(*) AS BIGINT) AS c1 FROM wds GROUP BY word), "
    r"vc AS (SELECT cast(count(*) AS BIGINT) AS v FROM uni) "
    r"SELECT bg.doc_id, cast(count(*) AS BIGINT) AS n_bigrams, "
    r"round(avg(ln((c12 + 0.5) / (c1 + 0.5 * v))), 6) AS avg_logp "
    r"FROM bg JOIN c12 USING (w1, w2) JOIN uni ON bg.w1 = uni.word "
    r"CROSS JOIN vc GROUP BY bg.doc_id",
    "CCNet-style corpus bigram-LM document scoring (add-0.5 smoothing): "
    "mean log-probability per doc — the quality-bucketing signal",
)


# --------------------------------------------------------------------------
# line-level boilerplate dedup + prefix-filter similarity join
# --------------------------------------------------------------------------


def _dd_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal over a pseudo-line corpus.

    The synthetic documents are single-line, so the entry derives
    lines deterministically (10-word chunks joined by newline) with
    the same expression in both engines, then runs the REAL operator
    (:func:`~dataframe_sql_spark.operators.dedup.line_dedup`) over it.
    """
    from .operators.dedup import line_dedup

    docs = _docs(spark, sf_dir)
    ws = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    nl = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.size(ws) / F.lit(10)).cast("int") - 1
                ),
                lambda i: F.array_join(F.slice(ws, i * F.lit(10) + 1, 10), " "),
            ),
            "\n",
        ).alias("text"),
    )
    return line_dedup(nl, "doc_id", "text", "\n", min_df=2)


_reg(
    "dd_lines",
    _dd_lines,
    r"WITH ws AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') "
    r"AS ws FROM documents), "
    r"ch AS (SELECT doc_id, list_transform(range(0, "
    r"cast(ceil(len(ws) / 10.0) AS INT)), "
    r"i -> array_to_string(ws[i*10+1:i*10+10], ' ')) AS chunks FROM ws), "
    r"lu AS (SELECT doc_id, unnest(list_transform(range(0, len(chunks)), "
    r"i -> {'pos': i, 'line': trim(chunks[i+1])})) AS u FROM ch), "
    r"l3 AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM lu), "
    r"boiler AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS dfq "
    r"FROM l3 WHERE len(line) >= 1 GROUP BY line) WHERE dfq >= 2), "
    r"flags AS (SELECT l3.doc_id, pos, l3.line, "
    r"(b.line IS NOT NULL AND len(l3.line) >= 1) AS is_boiler "
    r"FROM l3 LEFT JOIN boiler b ON l3.line = b.line) "
    r"SELECT doc_id, "
    r"coalesce(string_agg(CASE WHEN NOT is_boiler THEN line END, chr(10) "
    r"ORDER BY pos), '') AS clean_text, "
    r"cast(sum(CASE WHEN NOT is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
    r"cast(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed "
    r"FROM flags GROUP BY doc_id",
    "RefinedWeb-style line-level boilerplate removal: lines repeating "
    "across >= 2 docs dropped, survivors re-joined in order; exact "
    "kept/removed BIGINT counts",
)


def _dd_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        _docs(spark, sf_dir), "doc_id", "text", t_num=7, t_den=10
    )


_reg(
    "dd_prefix_pairs",
    # COMPLETENESS-certified similarity join: unlike LSH (probabilistic
    # recall) the prefix-filter theorem guarantees every J >= 0.7 pair
    # is found, so DuckDB's brute-force over ALL pairs is an exact
    # oracle for the whole output — a hash match proves both the
    # verification arithmetic AND the candidate completeness.
    _dd_prefix_pairs,
    "WITH "
    + "w AS (SELECT doc_id,"
    r" string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents), "
    r"sh AS (SELECT doc_id,"
    r" list_transform(range(1, greatest(len(ws) - 2, 1) + 1),"
    r" i -> array_to_string(ws[i:i+2], ' ')) AS s FROM w) "
    r"SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    r"cast(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter, "
    r"cast(len(list_distinct(list_cat(a.s, b.s))) AS BIGINT) AS uni "
    r"FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
    r"WHERE len(list_intersect(a.s, b.s)) * 10 >= "
    r"7 * len(list_distinct(list_cat(a.s, b.s)))",
    "prefix-filtering set-similarity join (AllPairs/PPJoin): ALL pairs "
    "with exact 3-shingle Jaccard >= 0.7, recall 1.0 by theorem — "
    "oracle brute-forces every pair, certifying completeness",
)


def _dd_bloom_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter no-false-negative certificate.

    Build the filter from even-doc_id head-grams (first 5 words — the
    repeated-head dedup key), probe the odd half, and emit one summary
    row: probe count, exact duplicate count, and the number of exact
    duplicates the filter MISSED (provably 0 — Bloom filters have no
    false negatives). The oracle recomputes the first two exactly and
    pins the third at 0: a broken filter (missed dup) breaks the hash.
    """
    from .functions.sketches import bloom_build, bloom_probe

    docs = _docs(spark, sf_dir)
    key = F.array_join(
        F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 5), " "
    )
    keyed = docs.select("doc_id", key.alias("k"))
    ref = keyed.filter(F.col("doc_id") % 2 == 0)
    probe = keyed.filter(F.col("doc_id") % 2 == 1)
    bits = bloom_build(ref, "k")
    flagged = bloom_probe(probe, bits, "doc_id", "k")
    exact = probe.join(
        ref.select("k").distinct().withColumn("__seen", F.lit(True)),
        "k",
        "left",
    ).select("doc_id", F.col("__seen").isNotNull().alias("is_dup"))
    both = flagged.join(exact, "doc_id")
    return both.agg(
        F.count("*").cast("bigint").alias("n_probe"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact_dup"),
        F.sum(F.when(F.col("is_dup") & ~F.col("maybe_seen"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_neg"),
    )


_reg(
    "dd_bloom_cert",
    _dd_bloom_cert,
    r"WITH d AS (SELECT doc_id, array_to_string("
    r"(string_split_regex(trim(lower(text)), '\s+'))[1:5], ' ') AS k "
    r"FROM documents), "
    r"p AS (SELECT doc_id, k FROM d WHERE doc_id % 2 = 1), "
    r"r AS (SELECT DISTINCT k FROM d WHERE doc_id % 2 = 0) "
    r"SELECT cast(count(*) AS BIGINT) AS n_probe, "
    r"cast(sum(CASE WHEN r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) "
    r"AS n_exact_dup, cast(0 AS BIGINT) AS n_false_neg "
    r"FROM p LEFT JOIN r ON p.k = r.k",
    "distributed Bloom filter (bit-position table form) certificate: "
    "build on even half's 5-word head-grams, probe odd half — zero "
    "false negatives, exact dup count oracle-checked",
)


# --------------------------------------------------------------------------
# k-means clustering + semantic dedup (SemDeDup)
# --------------------------------------------------------------------------

# Shared 2-iteration Lloyd trajectory in SQL (mirrors kmeans_assign
# with k=8, n_iters=2, centroid rounding 4dp): init = the 8 smallest
# vec_ids, one assignment, one rounded-mean update, final assignment.
_KM_CTE = (
    r"ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    r"init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v "
    r"FROM ev ORDER BY vec_id LIMIT 8), "
    r"a1 AS (SELECT ev.vec_id, (SELECT c FROM init "
    r"ORDER BY list_distance(init.v, ev.v), c LIMIT 1) AS c FROM ev), "
    r"cd AS (SELECT a1.c, r.i AS dim, round(avg(ev.v[r.i + 1]), 4) AS m "
    r"FROM a1 JOIN ev USING (vec_id), range(64) r(i) GROUP BY a1.c, r.i), "
    r"cent2 AS (SELECT c, list(m ORDER BY dim) AS v FROM cd GROUP BY c), "
    r"a2 AS (SELECT ev.vec_id, (SELECT c FROM cent2 "
    r"ORDER BY list_distance(cent2.v, ev.v), c LIMIT 1) AS c FROM ev)"
)


def _emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import kmeans_assign

    return kmeans_assign(
        _emb(spark, sf_dir), "vec_id", "embedding", k=8, n_iters=2
    ).select("vec_id", "cluster")


_reg(
    "emb_kmeans",
    _emb_kmeans,
    "WITH " + _KM_CTE + " SELECT vec_id, c AS cluster FROM a2",
    "Lloyd's k-means (k=8, 2 iterations, deterministic min-id init, "
    "4dp-rounded centroids) — the oracle replays the exact trajectory "
    "in SQL, certifying every assignment",
)


def _dd_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 'SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication'): cluster embeddings
    with k-means, then near-dup pairs are found ONLY within clusters —
    the quadratic pair cost is bounded per cluster instead of
    corpus-wide. Reuses kmeans_assign for the blocking key and
    embedding_cosine_pairs for the within-block exact cosine."""
    from .operators.dedup import embedding_cosine_pairs
    from .operators.similarity import kmeans_assign

    clustered = kmeans_assign(
        _emb(spark, sf_dir), "vec_id", "embedding", k=8, n_iters=2
    )
    pairs = embedding_cosine_pairs(
        clustered, "vec_id", "embedding", "cluster", threshold=0.4
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cos")
    )


_reg(
    "dd_semantic",
    _dd_semantic,
    "WITH "
    + _KM_CTE
    + r" SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    r"round(list_cosine_similarity(a.v, b.v), 6) AS cos "
    r"FROM (SELECT ev.*, a2.c FROM ev JOIN a2 USING (vec_id)) a "
    r"JOIN (SELECT ev.*, a2.c FROM ev JOIN a2 USING (vec_id)) b "
    r"ON a.c = b.c AND a.vec_id < b.vec_id "
    r"WHERE list_cosine_similarity(a.v, b.v) >= 0.4",
    "SemDeDup: k-means-blocked embedding near-dup pairs (cos >= 0.4) "
    "— quadratic cost bounded per cluster, not corpus-wide",
)


def _txt_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: term -> sorted posting list of doc ids.

    The retrieval-index construction pass (the BM25/TF-IDF entries
    score against corpus statistics; this materializes the index
    itself). One corpus shuffle on the term; postings are exact and
    sorted so the oracle compares bit-for-bit. At 100 TB the posting
    lists of head terms are the skew risk: the production layout
    writes this frame bucketed by term with per-term posting-block
    chunking (write_bucketed + fixed-size array slices) and
    delta-encoded ids; the build plan — explode, distinct, one
    groupBy — is unchanged.
    """
    from .operators.relevance import doc_words

    words = doc_words(_docs(spark, sf_dir), "doc_id", "text")
    return (
        words.select("word", "doc_id")
        .distinct()
        .groupBy("word")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sort_array(F.collect_set("doc_id")).alias("postings"),
        )
    )


_reg(
    "txt_inverted_index",
    _txt_inverted_index,
    "WITH "
    + _W_CTE
    + r" SELECT word, cast(count(DISTINCT doc_id) AS BIGINT) AS df, "
    r"list(DISTINCT doc_id ORDER BY doc_id) AS postings "
    r"FROM wds GROUP BY word",
    "inverted index build: term -> exact sorted posting list + "
    "document frequency, one term-keyed shuffle",
)


def _x_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the embedding kNN graph (top-3 cosine neighbors
    per vector, self excluded) — centrality as a quality-weighting
    signal. The graph build is the IVF cell-keyed kNN join
    (:func:`~dataframe_sql_spark.operators.similarity.knn_join_ivf`)
    at the SCALE configuration: ``n_cells`` from the corpus-size
    heuristic (cells ∝ N, occupancy 32) and PARTIAL probe
    (``n_probe=4``) — candidate volume is n_probe·occupancy per
    source, linear in the corpus, never all pairs. The oracle replays
    the whole approximate edge build in SQL (same construction as
    ``sim_knn_join_probed``: md5-deterministic centroids, pinned
    rounded cell ranking, the same integer n_cells formula), then the
    exact 2-step power iteration — so the hash certifies the
    approximate graph AND the rank trajectory. Rank iteration is the
    fully lazy :func:`~dataframe_sql_spark.operators.graph.pagerank`."""
    from .operators.graph import pagerank
    from .operators.similarity import knn_join_ivf

    emb = _emb(spark, sf_dir)
    edges = knn_join_ivf(
        emb.select(F.col("vec_id").alias("src"), "embedding"),
        emb.select(F.col("vec_id").alias("dst"), "embedding"),
        k=3,
        left_id="src",
        right_id="dst",
        n_probe=4,
        exclude_self=True,
    ).select("src", "dst")
    return pagerank(edges, n_iters=2)


_reg(
    "x_pagerank",
    _x_pagerank,
    r"WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    # replayed approximate edge build: heuristic cell count (exact
    # integer formula of ivf_default_cells), md5-deterministic
    # centroids, pinned rounded cell ranking (CELL_SCORE_DECIMALS),
    # nearest-cell assignment, 4-cell probe, cell equi-join candidates
    r"ncell AS (SELECT greatest(16, least(4096, (count(*) + 31) // 32)) AS n "
    r"FROM ev), "
    r"cents AS (SELECT cell, v FROM ("
    r"SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 "
    r"AS cell, v FROM ev) CROSS JOIN ncell WHERE cell < ncell.n), "
    r"rs AS (SELECT vec_id AS dst, v, cell FROM ("
    r"SELECT e.vec_id, e.v, c.cell, row_number() OVER (PARTITION BY e.vec_id "
    r"ORDER BY round(list_cosine_similarity(e.v, c.v), 8) DESC, c.cell) AS rn "
    r"FROM ev e CROSS JOIN cents c) WHERE rn = 1), "
    r"lp AS (SELECT vec_id AS src, v, cell FROM ("
    r"SELECT e.vec_id, e.v, c.cell, row_number() OVER (PARTITION BY e.vec_id "
    r"ORDER BY round(list_cosine_similarity(e.v, c.v), 8) DESC, c.cell) AS rn "
    r"FROM ev e CROSS JOIN cents c) WHERE rn <= 4), "
    r"cand AS (SELECT lp.src, lp.v AS lv, rs.dst, rs.v AS rv "
    r"FROM lp JOIN rs ON lp.cell = rs.cell AND lp.src <> rs.dst), "
    # MATERIALIZED: the pagerank chain references edges 4+ times
    # (nodes/deg/c1/c2); DuckDB would otherwise re-inline the whole
    # windowed candidate build per reference — measured 80 GB of temp
    # spill at sf0.1 vs 2 s materialized (the round-4 "oracle OOM" was
    # this inlining, not just candidate volume)
    r"edges AS MATERIALIZED (SELECT src, dst FROM ("
    r"SELECT src, dst, row_number() OVER (PARTITION BY src "
    r"ORDER BY list_cosine_similarity(lv, rv) DESC, dst) AS rn "
    r"FROM cand) WHERE rn <= 3), "
    r"nodes AS (SELECT DISTINCT id FROM "
    r"(SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)), "
    r"nt AS (SELECT count(*) AS n FROM nodes), "
    r"deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src), "
    r"p0 AS (SELECT id, round(1.0 / n, 6) AS rank FROM nodes CROSS JOIN nt), "
    r"d1 AS (SELECT coalesce(CAST(sum(CASE WHEN deg.deg IS NULL THEN "
    r"CAST(rank AS DECIMAL(18,6)) END) AS DOUBLE), 0) "
    r"AS dang FROM p0 LEFT JOIN deg ON p0.id = deg.src), "
    r"c1 AS (SELECT e.dst, CAST(sum(CAST(round(p0.rank / deg.deg, 12) "
    r"AS DECIMAL(18,12))) AS DOUBLE) AS cin FROM edges e "
    r"JOIN p0 ON e.src = p0.id JOIN deg ON e.src = deg.src GROUP BY e.dst), "
    r"p1 AS (SELECT id, round((1.0 - 0.85 + 0.85 * dang) / n + "
    r"0.85 * coalesce(cin, 0), 6) AS rank FROM nodes "
    r"LEFT JOIN c1 ON nodes.id = c1.dst CROSS JOIN nt CROSS JOIN d1), "
    r"d2 AS (SELECT coalesce(CAST(sum(CASE WHEN deg.deg IS NULL THEN "
    r"CAST(rank AS DECIMAL(18,6)) END) AS DOUBLE), 0) "
    r"AS dang FROM p1 LEFT JOIN deg ON p1.id = deg.src), "
    r"c2 AS (SELECT e.dst, CAST(sum(CAST(round(p1.rank / deg.deg, 12) "
    r"AS DECIMAL(18,12))) AS DOUBLE) AS cin FROM edges e "
    r"JOIN p1 ON e.src = p1.id JOIN deg ON e.src = deg.src GROUP BY e.dst) "
    r"SELECT id, round((1.0 - 0.85 + 0.85 * dang) / n + "
    r"0.85 * coalesce(cin, 0), 6) AS rank FROM nodes "
    r"LEFT JOIN c2 ON nodes.id = c2.dst CROSS JOIN nt CROSS JOIN d2",
    "PageRank (d=0.85, 2 iterations, dangling-mass redistribution, "
    "6dp-rounded trajectory) over the partial-probe IVF kNN graph "
    "(heuristic cell count, 4-cell probe) — the oracle replays the "
    "approximate edge build AND the exact power iteration in SQL",
)


def _x_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.profile import profile_frame

    return profile_frame(
        _docs(spark, sf_dir), ["doc_id", "text", "lang", "source", "n_chars"]
    )


_reg(
    "x_profile",
    _x_profile,
    # one UNION ALL arm per column; DuckDB may scan per arm — the
    # Spark side is the single-scan formulation being certified
    " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, cast(count(*) AS BIGINT) AS n_rows, "
        f"cast(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_null, cast(count(DISTINCT {c}) AS BIGINT) AS n_distinct, "
        f"min(cast({c} AS VARCHAR)) AS min_val, "
        f"max(cast({c} AS VARCHAR)) AS max_val FROM documents"
        for c in ["doc_id", "text", "lang", "source", "n_chars"]
    ),
    "single-scan per-column profile (rows/nulls/distincts/min/max) — "
    "the ANALYZE TABLE shape; N columns, one read",
)


def _pipe_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-tier dedup funnel — the production corpus-dedup stack,
    composed from certified parts, reporting oracle-checkable funnel
    counts per stage:

    1. exact (hash-keyed min-id survivors),
    2. near-dup via the prefix-filter similarity join (recall 1.0 BY
       THEOREM, so the SQL oracle's brute-force pair set is identical
       — a probabilistic LSH stage here would not be oracle-able),
    3. semantic (SemDeDup: k-means-blocked embedding cosine).

    Every stage's survivor rule is greedy min-id (drop every id_b of a
    qualifying pair), so the whole funnel is deterministic and the
    DuckDB oracle replays it end-to-end: exact grouping, complete
    Jaccard pairs, the 2-iteration k-means trajectory, and the
    cosine pair set. Output: (stage, method, n_in, n_removed, n_out).

    Scale: stages share no state; each is the already-audited operator
    (see SCALE.md). The funnel ordering is the cost-correct one —
    cheapest filter first, the quadratic-per-block semantic stage last
    when the corpus is smallest.
    """
    from .operators.dedup import (
        exact_dedup,
        embedding_cosine_pairs,
        prefix_filter_pairs,
    )
    from .operators.similarity import kmeans_assign

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = _emb(spark, sf_dir)
    s1 = exact_dedup(docs, ["text"], "doc_id")
    losers2 = (
        prefix_filter_pairs(s1, "doc_id", "text", t_num=7, t_den=10)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s2 = s1.join(losers2, "doc_id", "left_anti")
    emb2 = emb.join(s2.select(F.col("doc_id").alias("vec_id")), "vec_id")
    clustered = kmeans_assign(emb2, "vec_id", "embedding", k=8, n_iters=2)
    losers3 = (
        embedding_cosine_pairs(
            clustered, "vec_id", "embedding", "cluster", threshold=0.4
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s3 = s2.join(losers3, "doc_id", "left_anti")

    c0 = docs.agg(F.count("*").cast("bigint").alias("c0"))
    c1 = s1.agg(F.count("*").cast("bigint").alias("c1"))
    c2 = s2.agg(F.count("*").cast("bigint").alias("c2"))
    c3 = s3.agg(F.count("*").cast("bigint").alias("c3"))
    from .operators.scalars import broadcast_attach

    row = broadcast_attach(broadcast_attach(broadcast_attach(c0, c1), c2), c3)
    stages = F.array(
        F.struct(
            F.lit(1).cast("bigint").alias("stage"),
            F.lit("exact").alias("method"),
            F.col("c0").alias("n_in"),
            (F.col("c0") - F.col("c1")).alias("n_removed"),
            F.col("c1").alias("n_out"),
        ),
        F.struct(
            F.lit(2).cast("bigint").alias("stage"),
            F.lit("near_dup").alias("method"),
            F.col("c1").alias("n_in"),
            (F.col("c1") - F.col("c2")).alias("n_removed"),
            F.col("c2").alias("n_out"),
        ),
        F.struct(
            F.lit(3).cast("bigint").alias("stage"),
            F.lit("semantic").alias("method"),
            F.col("c2").alias("n_in"),
            (F.col("c2") - F.col("c3")).alias("n_removed"),
            F.col("c3").alias("n_out"),
        ),
    )
    return row.select(F.explode(stages).alias("p")).select("p.*")


_reg(
    "pipe_dedup_funnel",
    _pipe_dedup_funnel,
    r"WITH d AS (SELECT doc_id, text FROM documents), "
    r"s1 AS (SELECT d.* FROM d WHERE doc_id IN "
    r"(SELECT min(doc_id) FROM d GROUP BY text)), "
    r"w AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') "
    r"AS ws FROM s1), "
    r"sh AS (SELECT doc_id, list_transform(range(1, greatest(len(ws) - 2, 1) "
    r"+ 1), i -> array_to_string(ws[i:i+2], ' ')) AS s FROM w), "
    r"p2 AS (SELECT DISTINCT b.doc_id AS id_b FROM sh a JOIN sh b "
    r"ON a.doc_id < b.doc_id "
    r"WHERE len(list_intersect(a.s, b.s)) * 10 >= "
    r"7 * len(list_distinct(list_cat(a.s, b.s)))), "
    r"s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT id_b FROM p2)), "
    r"ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
    r"JOIN s2 ON vec_id = s2.doc_id), "
    r"init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v "
    r"FROM ev ORDER BY vec_id LIMIT 8), "
    r"a1 AS (SELECT ev.vec_id, (SELECT c FROM init "
    r"ORDER BY list_distance(init.v, ev.v), c LIMIT 1) AS c FROM ev), "
    r"cd AS (SELECT a1.c, r.i AS dim, round(avg(ev.v[r.i + 1]), 4) AS m "
    r"FROM a1 JOIN ev USING (vec_id), range(64) r(i) GROUP BY a1.c, r.i), "
    r"cent2 AS (SELECT c, list(m ORDER BY dim) AS v FROM cd GROUP BY c), "
    r"a2 AS (SELECT ev.vec_id, (SELECT c FROM cent2 "
    r"ORDER BY list_distance(cent2.v, ev.v), c LIMIT 1) AS c FROM ev), "
    r"p3 AS (SELECT DISTINCT bb.vec_id AS id_b FROM "
    r"(SELECT ev.vec_id, ev.v, a2.c FROM ev JOIN a2 USING (vec_id)) aa JOIN "
    r"(SELECT ev.vec_id, ev.v, a2.c FROM ev JOIN a2 USING (vec_id)) bb "
    r"ON aa.c = bb.c AND aa.vec_id < bb.vec_id "
    r"WHERE list_cosine_similarity(aa.v, bb.v) >= 0.4), "
    r"s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT id_b FROM p3)), "
    r"n AS (SELECT (SELECT count(*) FROM d) AS c0, "
    r"(SELECT count(*) FROM s1) AS c1, (SELECT count(*) FROM s2) AS c2, "
    r"(SELECT count(*) FROM s3) AS c3) "
    r"SELECT cast(1 AS BIGINT) AS stage, 'exact' AS method, "
    r"cast(c0 AS BIGINT) AS n_in, cast(c0 - c1 AS BIGINT) AS n_removed, "
    r"cast(c1 AS BIGINT) AS n_out FROM n "
    r"UNION ALL SELECT 2, 'near_dup', cast(c1 AS BIGINT), "
    r"cast(c1 - c2 AS BIGINT), cast(c2 AS BIGINT) FROM n "
    r"UNION ALL SELECT 3, 'semantic', cast(c2 AS BIGINT), "
    r"cast(c2 - c3 AS BIGINT), cast(c3 AS BIGINT) FROM n",
    "three-tier dedup funnel (exact -> complete-recall near-dup -> "
    "SemDeDup), per-stage counts oracle-replayed end-to-end",
)


def _a_hist_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile certificate: build per-(returnflag,
    linestatus) l_quantity histogram partials (the persistable
    pre-aggregate), merge across linestatus segments, estimate
    p50/p90, and set within_tol iff the estimate is within 2 bin
    widths of the exact interpolated percentile. The whole estimate
    path is integer arithmetic on fixed bin edges, so the oracle
    replays it EXACTLY (bin counts, crossing bin, right edge) — unlike
    the HLL certificate, the estimate itself hash-matches."""
    from .functions.sketches import hist_partials, hist_quantile_rollup

    li = engine_for(spark, sf_dir).spark.table("lineitem")
    parts = hist_partials(
        li, ["l_returnflag"], "l_linestatus", "l_quantity", 0.0, 51.0, 50
    )
    est = hist_quantile_rollup(
        parts, ["l_returnflag"], [0.5, 0.9], 0.0, 51.0, 50
    )
    exact = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("ex50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("ex90"),
    )
    width = 51.0 / 50
    joined = est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "q",
        "est_q",
        F.when(F.col("q") == 0.5, F.col("ex50"))
        .otherwise(F.col("ex90"))
        .alias("exact_q"),
    )
    return joined.withColumn(
        "within_tol",
        F.abs(F.col("est_q") - F.col("exact_q")) <= F.lit(2 * width),
    )


_reg(
    "a_hist_quantile_rollup",
    _a_hist_quantile,
    r"WITH p AS (SELECT l_returnflag, l_linestatus, "
    r"least(49, greatest(0, cast(floor((l_quantity - 0.0) / 1.02) AS INT))) "
    r"AS bin, cast(count(*) AS BIGINT) AS n FROM lineitem "
    r"GROUP BY l_returnflag, l_linestatus, bin), "
    r"m AS (SELECT l_returnflag, bin, cast(sum(n) AS BIGINT) AS n FROM p "
    r"GROUP BY l_returnflag, bin), "
    r"c AS (SELECT l_returnflag, bin, "
    r"sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum, "
    r"sum(n) OVER (PARTITION BY l_returnflag) AS tot FROM m), "
    r"qs AS (SELECT unnest([0.5, 0.9]) AS q), "
    r"hit AS (SELECT l_returnflag, q, min(bin) AS bin FROM c CROSS JOIN qs "
    r"WHERE cum >= q * tot GROUP BY l_returnflag, q), "
    r"est AS (SELECT l_returnflag, q, "
    r"round(0.0 + (bin + 1) * 1.02, 4) AS est_q FROM hit), "
    r"ex AS (SELECT l_returnflag, "
    r"round(quantile_cont(l_quantity, 0.5), 4) AS ex50, "
    r"round(quantile_cont(l_quantity, 0.9), 4) AS ex90 FROM lineitem "
    r"GROUP BY l_returnflag) "
    r"SELECT est.l_returnflag, q, est_q, "
    r"CASE WHEN q = 0.5 THEN ex50 ELSE ex90 END AS exact_q, "
    r"abs(est_q - CASE WHEN q = 0.5 THEN ex50 ELSE ex90 END) <= 2.04 "
    r"AS within_tol "
    r"FROM est JOIN ex ON est.l_returnflag = ex.l_returnflag",
    "mergeable histogram-quantile rollup (per-segment partials -> "
    "merged p50/p90): estimate replayed EXACTLY by the oracle, "
    "tolerance vs exact interpolated percentile certified",
)


def _a_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter certificate: build per-source CMS
    partials over the word stream, merge, probe the exact top-10 words
    (count desc, word tiebreak — deterministic), and certify the
    no-underestimate property. Both the estimate and the property are
    oracle-replayed exactly (md5 bucket hash is engine-portable)."""
    from pyspark.sql import Window

    from .functions.sketches import cms_estimate, cms_merge, cms_partials
    from .operators.relevance import doc_words

    docs = _docs(spark, sf_dir)
    words = doc_words(docs, "doc_id", "text").join(
        docs.select("doc_id", "source"), "doc_id"
    )
    counters = cms_merge(cms_partials(words, "source", "word"))
    exact = words.groupBy("word").agg(F.count("*").cast("bigint").alias("exact_n"))
    w = Window.orderBy(F.col("exact_n").desc(), F.col("word"))
    top = (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .drop("__rn")
    )
    est = cms_estimate(top.select("word"), counters, "word")
    return top.join(est, "word").select(
        "word",
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("no_underestimate"),
    )


_reg(
    "a_cms_heavy_hitters",
    _a_cms_heavy_hitters,
    "WITH "
    + _W_CTE
    + r", wsrc AS (SELECT wds.doc_id, word, source FROM wds "
    r"JOIN documents USING (doc_id)), "
    r"buck AS (SELECT word, j, "
    r"('0x' || substr(md5(word || ':' || j), 1, 8))::BIGINT % 1024 AS idx "
    r"FROM wsrc CROSS JOIN range(4) t(j)), "
    r"counters AS (SELECT j, idx, cast(count(*) AS BIGINT) AS n "
    r"FROM buck GROUP BY j, idx), "
    r"exact AS (SELECT word, cast(count(*) AS BIGINT) AS exact_n "
    r"FROM wsrc GROUP BY word), "
    r"top AS (SELECT word, exact_n FROM ("
    r"SELECT word, exact_n, row_number() OVER ("
    r"ORDER BY exact_n DESC, word) AS rn FROM exact) WHERE rn <= 10), "
    r"probe AS (SELECT word, j, "
    r"('0x' || substr(md5(word || ':' || j), 1, 8))::BIGINT % 1024 AS idx "
    r"FROM top CROSS JOIN range(4) t(j)), "
    r"est AS (SELECT probe.word, cast(min(coalesce(n, 0)) AS BIGINT) "
    r"AS cms_est FROM probe LEFT JOIN counters "
    r"ON probe.j = counters.j AND probe.idx = counters.idx "
    r"GROUP BY probe.word) "
    r"SELECT top.word, exact_n, cms_est, cms_est >= exact_n "
    r"AS no_underestimate FROM top JOIN est ON top.word = est.word",
    "Count-Min heavy hitters (4x1024 md5 counters, per-source "
    "partials merged): exact top-10 probed, estimate AND "
    "no-underestimate property oracle-replayed exactly",
)


_reg(
    "sim_ann_ivfpq",
    # IVF-PQ internals (residual codebooks) aren't SQL-expressible ->
    # rows-only here; recall floors are pytest-gated
    # (tests/test_ann_index.py::test_ivfpq_*), and the full-probe
    # configuration is held to >= 0.9 recall vs exact.
    lambda spark, sf_dir: __import__(
        "dataframe_sql_spark.operators.similarity", fromlist=["ivfpq_topk"]
    ).ivfpq_topk(
        _emb(spark, sf_dir), "embedding", _QUERY_VEC, k=10,
        n_cells=8, n_probe=4, rerank=100,
    ),
    None,
    "IVF-PQ ANN (coarse cells + residual product quantization, "
    "per-cell ADC LUTs, exact-cosine rerank) — the billion-scale "
    "index composition; recall pytest-gated",
)


_reg_sql(
    "ts_ohlc_resample",
    # hypertable-style rollup: downsample the raw event stream to
    # hourly OHLC bars per event type. open/close pick the earliest/
    # latest row with a (ts, event_id) tiebreak so the result is
    # deterministic under concurrent timestamps; one shuffle on
    # (event_type, hour) shared by the windows and the aggregate —
    # the continuous-aggregate shape persisted per segment at scale
    # (st_rollup_multires is the streaming twin).
    "with e as (select event_type, date_trunc('hour', ts) as h, "
    "ts, event_id, value from events), "
    "rn as (select *, "
    "row_number() over (partition by event_type, h "
    "order by ts, event_id) as rno, "
    "row_number() over (partition by event_type, h "
    "order by ts desc, event_id desc) as rnc from e) "
    "select event_type, h, "
    "max(case when rno = 1 then value end) as open, "
    "max(value) as high, min(value) as low, "
    "max(case when rnc = 1 then value end) as close, "
    "cast(count(*) as bigint) as n_events "
    "from rn group by event_type, h",
    None,  # identical ANSI text runs on DuckDB
    "hourly OHLC downsampling (hypertable continuous-aggregate "
    "shape): deterministic open/close via tie-broken row_number, "
    "raw-value doubles so the compare is bit-exact",
)


_reg_sql(
    "x_weighted_sample",
    # Quality-weighted deterministic sampling: each doc keeps with
    # probability proportional to its length share (stand-in for any
    # quality weight, e.g. the x_pagerank centrality or txt_lm_score).
    # The coin is the repo's engine-portable md5 fraction — no RNG, so
    # reruns and the oracle agree bit-for-bit; the max-weight scalar
    # attaches via a subquery (1-row broadcast). Map-side except the
    # 1-row aggregate: the 100 TB shape for importance sampling.
    "select doc_id, n_chars from documents "
    "where cast(conv(substring(md5(concat(cast(doc_id as string), ':ws42')), "
    "1, 8), 16, 10) as double) / 4294967296.0 "
    "< cast(n_chars as double) / (select max(n_chars) from documents)",
    "SELECT doc_id, n_chars FROM documents "
    "WHERE ('0x' || substr(md5(doc_id || ':ws42'), 1, 8))::BIGINT "
    "/ 4294967296.0 "
    "< cast(n_chars AS DOUBLE) / (SELECT max(n_chars) FROM documents)",
    "deterministic importance sampling (keep-probability proportional "
    "to a per-row weight, md5 coin) — authority/quality-weighted "
    "corpus subsetting with a bit-exact oracle",
)

_reg_sql(
    "f_edit_distance",
    # Edit-distance function surface over adjacent-id doc pairs (the
    # fuzzy-matching primitive for record linkage); truncated to 25
    # chars because Levenshtein is O(len^2) per pair — at scale this
    # runs AFTER a candidate generator (LSH/prefix-filter), never as
    # a raw cross product.
    "select a.doc_id as id_a, b.doc_id as id_b, "
    "cast(levenshtein(substring(a.text, 1, 25), substring(b.text, 1, 25)) "
    "as bigint) as dist "
    "from documents a join documents b on b.doc_id = a.doc_id + 1",
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "cast(levenshtein(substr(a.text, 1, 25), substr(b.text, 1, 25)) "
    "AS BIGINT) AS dist "
    "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1",
    "Levenshtein edit distance over candidate pairs — integer output, "
    "bit-exact differential",
)


def _x_split_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split leakage audit: after the engine's own deterministic
    train/val hash split, flag every val document sharing an exact
    word 8-gram with ANY train document — the thing you must measure
    before trusting a held-out set built from a near-dup-ridden
    corpus. Composes x_hash_split and the dd_decontaminate semi-join;
    the only corpus-wide exchange is the gram-hash semi-join."""
    from .operators.dedup import kgram_positions
    from .operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    split = hash_split(docs, "doc_id", {"train": 0.9, "val": 0.1}, seed=42)
    train = split.filter(F.col("split") == "train")
    val = split.filter(F.col("split") == "val")
    train_grams = (
        kgram_positions(train, "doc_id", "text", k=8).select("gh").distinct()
    )
    val_hits = (
        kgram_positions(val, "doc_id", "text", k=8)
        .join(train_grams, on="gh", how="left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        val.select("doc_id")
        .join(val_hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("__hit"), F.lit(False)).alias("contaminated")
        )
    )


_reg(
    "x_split_decontaminate",
    _x_split_decontaminate,
    f"WITH s AS (SELECT doc_id, text, CASE WHEN {_BUCKET_SQL} < "
    f"'{hex_threshold(0.9)}' THEN 'train' ELSE 'val' END AS split "
    "FROM documents), "
    r"words AS (SELECT doc_id, split, "
    r"string_split_regex(trim(lower(text)), '\s+') AS w FROM s), "
    r"grams AS (SELECT doc_id, split, "
    r"w[pos] || ' ' || w[least(pos+1, len(w))] || ' ' || "
    r"w[least(pos+2, len(w))] || ' ' || w[least(pos+3, len(w))] || ' ' || "
    r"w[least(pos+4, len(w))] || ' ' || w[least(pos+5, len(w))] || ' ' || "
    r"w[least(pos+6, len(w))] || ' ' || w[least(pos+7, len(w))] AS g "
    r"FROM (SELECT doc_id, split, w, "
    r"unnest(generate_series(1, greatest(len(w) - 7, 1))) AS pos "
    r"FROM words) p), "
    r"tg AS (SELECT DISTINCT g FROM grams WHERE split = 'train'), "
    r"hit AS (SELECT DISTINCT doc_id FROM grams "
    r"WHERE split = 'val' AND g IN (SELECT g FROM tg)) "
    r"SELECT doc_id, doc_id IN (SELECT doc_id FROM hit) AS contaminated "
    r"FROM s WHERE split = 'val'",
    "cross-split leakage audit: val docs sharing an exact 8-gram with "
    "the train split (hash split + gram semi-join composed), the "
    "held-out-set trust check",
)


_reg_sql(
    "x_bottomk_sample",
    # Bottom-k sketch: the k smallest md5(fingerprint) values form a
    # uniform sample of DISTINCT texts that is MERGEABLE (union two
    # sketches, keep the k smallest again) and consistent (the same
    # text always carries the same hash, so re-ingestion can't inflate
    # its chance). The mergeable-distinct-sample primitive behind
    # KMV/theta cardinality sketches; TakeOrderedAndProject, no global
    # sort.
    "select doc_id, h from (select doc_id, "
    "md5(regexp_replace(trim(lower(text)), '\\\\s+', ' ')) as h "
    "from documents) t order by h, doc_id limit 20",
    r"SELECT doc_id, h FROM (SELECT doc_id, "
    r"md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS h "
    r"FROM documents) t ORDER BY h, doc_id LIMIT 20",
    "bottom-k (KMV-style) mergeable distinct sample: k smallest "
    "fingerprint hashes, consistent under re-ingestion",
)

def _x_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-quartile bucketing WITHOUT a single-partition window:
    a naive ``ntile(4) OVER (ORDER BY ...)`` funnels the whole corpus
    through one task (the pre-round-3 global-rank trap), so this
    computes the identical tiles from the two-pass range-partitioned
    :func:`~dataframe_sql_spark.operators.rank.global_rank` plus the
    closed-form ntile formula (the first ``N mod n`` tiles take
    ``ceil(N/n)`` rows, the rest ``floor(N/n)``) — pure arithmetic on
    (rank, N), differential-tested against the oracle's native ntile.
    """
    from .operators.rank import global_rank

    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    ranked = global_rank(
        docs, [("n_chars", True), ("doc_id", True)], out_col="__r"
    )
    n_total = ranked.agg(F.count("*").alias("__n"))
    n_tiles = F.lit(4)
    big = F.ceil(F.col("__n") / n_tiles).cast("bigint")  # rows in big tiles
    small = F.floor(F.col("__n") / n_tiles).cast("bigint")
    n_big = (F.col("__n") % n_tiles).cast("bigint")  # how many big tiles
    cut = n_big * big  # ranks <= cut live in big tiles
    tile = F.when(
        F.col("__r") <= cut, F.ceil(F.col("__r") / big)
    ).otherwise(n_big + F.ceil((F.col("__r") - cut) / small))
    from .operators.scalars import broadcast_attach

    return broadcast_attach(ranked, n_total).select(
        "doc_id",
        "n_chars",
        tile.cast("int").alias("quality_q"),
    )


_reg(
    "x_quality_buckets",
    _x_quality_buckets,
    "SELECT doc_id, n_chars, "
    "ntile(4) OVER (ORDER BY n_chars, doc_id) AS quality_q "
    "FROM documents",
    "quality-quartile assignment (deterministic tiebreak) via the "
    "two-pass range-partitioned rank + closed-form ntile arithmetic "
    "- no SinglePartition window; oracle uses native ntile",
)

# --------------------------------------------------------------------------
# round-3c: range-join entry, record linkage, minhash-estimate certificate,
# skew diagnostics
# --------------------------------------------------------------------------


def _j_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side Bloom-prefiltered shuffle join
    (:func:`~dataframe_sql_spark.operators.joins.bloom_prefilter_join`):
    the huge probe side (lineitem) is filtered by a packed-bitset
    literal built from the selective build side's keys (high-value
    orders) BEFORE any exchange — the shuffle moves matches + ~1e-5
    false positives instead of every probe row. The oracle runs the
    PLAIN join: a hash match certifies the filter's no-false-negative
    contract (identical join result), which is the entire correctness
    surface of a Bloom prefilter."""
    from .operators.joins import bloom_prefilter_join

    eng = engine_for(spark, sf_dir)
    li = eng.spark.table("lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = (
        eng.spark.table("orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    return (
        bloom_prefilter_join(li, od, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_reg(
    "j_bloom_prefilter",
    _j_bloom_prefilter,
    "SELECT o_orderpriority, count(*)::BIGINT AS n_items,"
    " CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))"
    " AS DOUBLE) AS revenue "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "WHERE o_totalprice > 400000 "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "map-side Bloom-prefiltered shuffle join (packed-bitset literal "
    "from the selective build side; no false negatives — oracle runs "
    "the plain join)",
)


def _j_range_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join through the bucketed rewrite.

    Incidents are 15-minute windows opened by a deterministic subset of
    error events; the query counts events (and sums their value) inside
    each window. ``range_join(..., bucket_granularity='hour')`` rewrites
    the inequality join as an equi-join on hour buckets (each interval
    explodes onto ≤ 2 buckets) with the residual range predicate
    filtering inside the bucket — no BroadcastNestedLoopJoin, plan-gated
    in test_plan_quality. The DuckDB oracle runs the naive inequality
    join, pinning the rewrite's semantics.
    """
    ev = _events(spark, sf_dir).select("event_id", "ts", "value")
    inc = (
        _events(spark, sf_dir)
        .filter((F.col("event_type") == "error") & (F.col("event_id") % 20 == 0))
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
        )
    )
    hits = range_join(ev, inc, "ts", "start_ts", "end_ts", bucket_granularity="hour")
    return (
        hits.groupBy("incident_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("incident_id")
    )


_reg(
    "j_range_incidents",
    _j_range_incidents,
    "WITH inc AS (SELECT event_id AS incident_id, ts AS start_ts,"
    " ts + INTERVAL 15 MINUTE AS end_ts FROM events"
    " WHERE event_type = 'error' AND event_id % 20 = 0) "
    "SELECT incident_id, count(*)::BIGINT AS n_events,"
    " CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value "
    "FROM events e JOIN inc ON e.ts >= inc.start_ts AND e.ts < inc.end_ts "
    "GROUP BY incident_id ORDER BY incident_id",
    "range join (point-in-interval) via the scalable bucketed rewrite; "
    "oracle runs the naive inequality join",
)


def _j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via the bucketed rewrite: which incident
    windows (60 min after every-5th error event) overlap which
    maintenance windows (60 min after every-5th signup event) — the
    %5 sampling + 60-min width is deliberate: sparser selections or
    shorter windows overlap nothing in the synthetic events. The
    DuckDB oracle runs the naive overlap inequality join."""
    from .operators.joins import interval_overlap_join

    ev = _events(spark, sf_dir)
    inc = ev.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 5 == 0)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("i_start"),
        (F.col("ts") + F.expr("INTERVAL 60 MINUTES")).alias("i_end"),
    )
    mnt = ev.filter(
        (F.col("event_type") == "signup") & (F.col("event_id") % 5 == 0)
    ).select(
        F.col("event_id").alias("maint_id"),
        F.col("ts").alias("m_start"),
        (F.col("ts") + F.expr("INTERVAL 60 MINUTES")).alias("m_end"),
    )
    out = interval_overlap_join(
        inc, mnt, "i_start", "i_end", "m_start", "m_end", bucket_granularity="hour"
    )
    return out.select("incident_id", "maint_id").orderBy("incident_id", "maint_id")


_reg(
    "j_interval_overlap",
    _j_interval_overlap,
    "WITH inc AS (SELECT event_id AS incident_id, ts AS i_start,"
    " ts + INTERVAL 60 MINUTE AS i_end FROM events"
    " WHERE event_type = 'error' AND event_id % 5 = 0), "
    "mnt AS (SELECT event_id AS maint_id, ts AS m_start,"
    " ts + INTERVAL 60 MINUTE AS m_end FROM events"
    " WHERE event_type = 'signup' AND event_id % 5 = 0) "
    "SELECT incident_id, maint_id FROM inc JOIN mnt"
    " ON i_start < m_end AND m_start < i_end "
    "ORDER BY incident_id, maint_id",
    "interval-overlap join (the second temporal-join shape) via the "
    "bucketed equi-join rewrite; oracle runs the naive inequality join",
)

_reg_sql(
    "x_score_calibration",
    # Cross-source score calibration: replace a raw quality score with
    # its within-source quantile (percent_rank) so a global threshold
    # means the same thing for every source — the step before mixing
    # when sources have incomparable score scales (a FineWeb-style
    # classifier score on web text vs code). One shuffle on source;
    # deterministic tiebreak by doc_id. percent_rank = (rank-1)/(n-1)
    # is a ratio of small ints — bit-identical across engines.
    "select doc_id, source, n_chars, "
    "percent_rank() over (partition by source "
    "order by n_chars, doc_id) as q "
    "from documents order by doc_id",
    None,  # identical SQL runs on DuckDB
    "cross-source score calibration: within-source percent_rank "
    "quantile replaces the raw score (comparable thresholds across "
    "heterogeneous sources)",
)

_reg_sql(
    "x_source_cap",
    # Per-source volume cap: keep at most N docs per source,
    # deterministically chosen by the md5 coin (not arrival order, so
    # reruns and engines agree and no partition-order bias). The
    # anti-skew guard for dominant domains before mixing: one shuffle
    # on source, per-group top-N via ranked window.
    "select doc_id, source from ("
    "select doc_id, source, row_number() over (partition by source "
    "order by md5(concat(cast(doc_id as string), ':cap42')), doc_id) as rn "
    "from documents) t where rn <= 20 order by doc_id",
    "SELECT doc_id, source FROM ("
    "SELECT doc_id, source, row_number() OVER (PARTITION BY source "
    "ORDER BY md5(doc_id || ':cap42'), doc_id) AS rn "
    "FROM documents) t WHERE rn <= 20 ORDER BY doc_id",
    "per-source volume cap (keep <= N per source, md5-deterministic "
    "choice) — dominant-domain anti-skew before mixing",
)


def _x_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: link dirty records back to a master table.

    The dirty side is derived deterministically (customers with
    ``c_custkey % 7 = 3``, last character of the name dropped) so both
    engines build the identical input. Blocking on ``c_nationkey``
    bounds the candidate quadratic; scoring is built-in JVM
    ``levenshtein``; one best match per dirty record (min distance,
    then min key).
    """
    cust = engine_for(spark, sf_dir).spark.table("customer")
    dirty = cust.filter(F.col("c_custkey") % 7 == 3).select(
        F.col("c_custkey").alias("d_id"),
        F.expr("substring(c_name, 1, length(c_name) - 1)").alias("d_name"),
        "c_nationkey",
    )
    return (
        best_match_linkage(
            dirty,
            cust,
            ["c_nationkey"],
            "d_id",
            "c_custkey",
            "d_name",
            "c_name",
            max_distance=2,
        )
        .select(
            "d_id",
            "matched_id",
            F.col("distance").cast("bigint").alias("distance"),
        )
        .orderBy("d_id")
    )


_reg(
    "x_record_linkage",
    _x_record_linkage,
    "WITH dirty AS (SELECT c_custkey AS d_id,"
    " substring(c_name, 1, length(c_name) - 1) AS d_name, c_nationkey"
    " FROM customer WHERE c_custkey % 7 = 3), "
    "scored AS (SELECT d.d_id, c.c_custkey AS matched_id,"
    " levenshtein(d.d_name, c.c_name) AS distance"
    " FROM dirty d JOIN customer c ON d.c_nationkey = c.c_nationkey"
    " WHERE levenshtein(d.d_name, c.c_name) <= 2) "
    "SELECT d_id, matched_id, distance::BIGINT AS distance FROM ("
    " SELECT *, row_number() OVER (PARTITION BY d_id"
    "  ORDER BY distance, matched_id) AS rn FROM scored) t "
    "WHERE rn = 1 ORDER BY d_id",
    "record linkage: nation-blocked levenshtein best-match per dirty "
    "record (deterministic truncated-name dirty side)",
)


def _dd_minhash_est_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minhash ESTIMATION-ACCURACY certificate (hash-checkable).

    ``dd_minhash_verified`` certifies LSH *recall*; this entry certifies
    the other half of the minhash contract — that lane agreement of the
    production OPH signature estimates Jaccard. Over every pair with
    exact word-shingle Jaccard >= 0.5 (the complete shingle-sharing
    candidate superset, same certificate-only generator as
    dd_clusters_verified), the 64-lane agreement fraction must sit
    within ``tol`` of the exact Jaccard. DuckDB recomputes the same
    pair set and pins ``within_tol = TRUE``; a single out-of-tolerance
    pair hash-mismatches the entry.

    tol = 0.25 against a 64-lane binomial std of sqrt(J(1-J)/64) <=
    0.0625 in this J-range (4 sigma per pair) plus OPH densification
    bias on short docs; the pipeline is fully deterministic, so the
    margin is verified empirically rather than probabilistic at driver
    time: measured max |est - exact| is 0.2014 at sf0.001 (28 pairs;
    one short-doc outlier) and 0.0543 at sf0.01 (25 pairs).
    """
    docs = _docs(spark, sf_dir)
    exact = ngram_jaccard_pairs(
        docs, _shingle_sharing_candidates(docs), "doc_id", "text", threshold=0.5
    )
    h = hashed_shingle_frame(docs, "doc_id", "text")
    raw = h.select("doc_id", oph_raw_lanes(F.col("__h"), 64).alias("__raw"))
    sig = raw.select(
        "doc_id", oph_densify_rotation(F.col("__raw"), 64).alias("sig")
    )
    est = (
        exact.join(
            sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .withColumn(
            "est_j",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda v: v,
                )
            )
            / F.lit(64),
        )
    )
    return est.select(
        "id_a",
        "id_b",
        (F.abs(F.col("est_j") - F.col("jaccard")) <= 0.25).alias("within_tol"),
    )


_reg(
    "dd_minhash_est_cert",
    _dd_minhash_est_cert,
    f"WITH {_SH_CTE}, "
    r"ex AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh), "
    r"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
    r" FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id) "
    r"SELECT c.id_a, c.id_b, TRUE AS within_tol "
    r"FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b "
    r"WHERE len(list_intersect(x.s, y.s))::DOUBLE"
    r" / len(list_distinct(list_cat(x.s, y.s))) >= 0.5",
    "minhash estimation-accuracy certificate: 64-lane OPH agreement "
    "fraction within 0.25 of exact Jaccard on every J>=0.5 pair",
    oracle_max_sf=0.01,  # complete-pair-set oracle is quadratic by design
)

def _x_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate generation + levenshtein verify.

    Rank customers by name (two-pass global rank — no single-partition
    window), pair every record with its next 3 neighbors in sort order,
    keep pairs within edit distance 2. The DuckDB oracle replays the
    same neighborhood with a native row_number window and a position
    band join.
    """
    cust = engine_for(spark, sf_dir).spark.table("customer")
    pairs = sorted_neighborhood_pairs(cust, ["c_name"], "c_custkey", window=3)
    names = cust.select("c_custkey", "c_name")
    return (
        pairs.join(
            names.select(
                F.col("c_custkey").alias("id_a"), F.col("c_name").alias("n_a")
            ),
            "id_a",
        )
        .join(
            names.select(
                F.col("c_custkey").alias("id_b"), F.col("c_name").alias("n_b")
            ),
            "id_b",
        )
        .withColumn("distance", F.levenshtein("n_a", "n_b"))
        .filter(F.col("distance") <= 2)
        .select("id_a", "id_b", F.col("distance").cast("bigint").alias("distance"))
        .orderBy("id_a", "id_b")
    )


_reg(
    "x_sorted_neighborhood",
    _x_sorted_neighborhood,
    "WITH ranked AS (SELECT c_custkey, c_name,"
    " row_number() OVER (ORDER BY c_name, c_custkey) AS pos FROM customer) "
    "SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,"
    " levenshtein(a.c_name, b.c_name)::BIGINT AS distance "
    "FROM ranked a JOIN ranked b"
    " ON b.pos > a.pos AND b.pos <= a.pos + 3 "
    "WHERE levenshtein(a.c_name, b.c_name) <= 2 "
    "ORDER BY id_a, id_b",
    "sorted-neighborhood blocking (rank by name, pair within 3 "
    "positions, verify by edit distance) — linear candidate volume",
)


def _dd_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment (overlap-coefficient) near-dup pairs.

    Containment |A∩B| / min(|A|, |B|) catches near-SUBSET duplication
    — a short doc embedded in a longer one — which symmetric Jaccard
    dilutes below threshold (|A∩B|/|A∪B| shrinks as the size gap
    grows). Same (lang, source) blocking and integer set-size
    discipline as ``dd_ngram_jaccard``; the two entries together cover
    both duplication geometries. Emits every in-block pair's integer
    stats plus the ``is_dup`` (>= 0.8) flag, so the differential check
    pins the full computation AND the decision boundary.
    """
    docs = _docs(spark, sf_dir)
    sh = shingle_frame(docs, "doc_id", "text", extra_cols=("lang", "source"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh")))
    smaller = F.least(F.size(F.col("a.__sh")), F.size(F.col("b.__sh")))
    return a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        inter.cast("bigint").alias("inter"),
        smaller.cast("bigint").alias("smaller"),
        (inter.cast("double") / smaller >= 0.8).alias("is_dup"),
    )


_reg(
    "dd_containment",
    _dd_containment,
    r"WITH w AS (SELECT doc_id, lang, source,"
    r" string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents), "
    r"sh AS (SELECT doc_id, lang, source,"
    r" list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1) + 1),"
    r"  i -> array_to_string(ws[i:i+2], ' '))) AS s FROM w) "
    r"SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    r" len(list_intersect(a.s, b.s))::BIGINT AS inter,"
    r" least(len(a.s), len(b.s))::BIGINT AS smaller,"
    r" len(list_intersect(a.s, b.s))::DOUBLE"
    r"  / least(len(a.s), len(b.s)) >= 0.8 AS is_dup "
    r"FROM sh a JOIN sh b ON a.lang = b.lang AND a.source = b.source"
    r" AND a.doc_id < b.doc_id",
    "containment (overlap-coefficient) stats per blocked pair with the "
    ">= 0.8 near-subset-dup flag: the duplication geometry symmetric "
    "Jaccard misses",
)


def _ewma_sql(table: str = "events", round4: bool = True, with_ts: bool = True) -> str:
    """Shared EWMA text for both engines AND the scale-stress harness
    (alpha=1/2, current row + 7 lags = an 8-term bounded window).

    Powers of 1/2 are EXACT doubles, and both engines parse the +
    chain left-associated, so numerator/denominator bits agree without
    any decimal detour; round(.,4) guards the division's last ulp.
    The bounded window keeps it a fixed-width window function — the
    streaming/window-function form of smoothing, not the recursive
    full-history EWMA (which needs a stateful scan and is run through
    applyInPandasWithState at 100 TB).
    """
    w = "over (partition by user_id order by ts, event_id)"
    num = ["value"]
    den = ["1.0"]
    for j in range(1, 8):
        c = 0.5**j
        num.append(f"coalesce(lag(value, {j}) {w}, 0) * {c!r}")
        den.append(f"case when lag(value, {j}) {w} is null then 0 else {c!r} end")
    expr = "(" + " + ".join(num) + ") / (" + " + ".join(den) + ")"
    if round4:
        expr = f"round({expr}, 4)"
    cols = "event_id, user_id, ts, " if with_ts else "event_id, user_id, "
    return f"select {cols}{expr} as ewma from {table}"


_reg_sql(
    "ts_ewma",
    _ewma_sql(),
    None,  # identical SQL runs on DuckDB
    "per-user exponentially-weighted moving average (alpha=1/2, "
    "current row + 7 lags: 8-term bounded window): exact power-of-two "
    "weights, one user_id shuffle",
)


def _x_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog wrapper for :func:`operators.sampling.negative_pairs`
    (the md5-mod-N contrastive negative sampler; see its docstring for
    the plan shape and determinism argument)."""
    from .operators.sampling import negative_pairs

    return negative_pairs(_docs(spark, sf_dir), "doc_id", k=4).orderBy(
        "doc_id", "j"
    )


_reg(
    "x_negative_pairs",
    _x_negative_pairs,
    "WITH idx AS (SELECT doc_id,"
    " row_number() OVER (ORDER BY doc_id) AS pos FROM documents), "
    "probes AS (SELECT doc_id, pos, j,"
    " (('0x' || substr(md5(doc_id || ':neg:' || j), 1, 8))::BIGINT"
    "  % (SELECT count(*) FROM documents)) + 1 AS tpos"
    " FROM idx, (VALUES (1), (2), (3), (4)) AS js(j)) "
    "SELECT p.doc_id, p.j::BIGINT AS j, t.doc_id AS neg_id "
    "FROM probes p JOIN idx t ON t.pos = p.tpos "
    "WHERE p.tpos <> p.pos ORDER BY p.doc_id, p.j",
    "deterministic contrastive negative sampling (md5 coin mod N onto "
    "a dense position index; ~4 negatives per doc, bit-exact oracle)",
)


def _dd_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source shingle-overlap matrix — the corpus diagnostic
    behind mixture design and leakage audits: two sources sharing a
    large fraction of their 3-gram vocabulary double-count under naive
    mixing weights. Shuffles on the 8-byte shingle identity (distinct
    (source, gram) first, so the join input is vocabulary-sized, not
    corpus-sized); least/greatest is unnecessary because the a < b
    join direction already folds each pair once.
    """
    docs = _docs(spark, sf_dir)
    sh = shingle_frame(docs, "doc_id", "text", extra_cols=("source",))
    sg = sh.select("source", F.explode("__sh").alias("g")).distinct()
    return (
        sg.alias("a")
        .join(
            sg.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared_grams"))
        .orderBy("src_a", "src_b")
    )


_reg(
    "dd_overlap_matrix",
    _dd_overlap_matrix,
    r"WITH w AS (SELECT doc_id, source,"
    r" string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents), "
    r"sh AS (SELECT doc_id, source,"
    r" list_transform(range(1, greatest(len(ws) - 2, 1) + 1),"
    r"  i -> array_to_string(ws[i:i+2], ' ')) AS s FROM w), "
    r"sg AS (SELECT DISTINCT source, unnest(s) AS g FROM sh) "
    r"SELECT a.source AS src_a, b.source AS src_b,"
    r" count(*)::BIGINT AS n_shared_grams "
    r"FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source "
    r"GROUP BY a.source, b.source ORDER BY src_a, src_b",
    "cross-source 3-gram vocabulary overlap matrix (distinct-first "
    "join is vocabulary-sized) — mixture/leakage diagnostic",
)

_reg_sql(
    "x_snapshot_diff",
    # CDC snapshot diff: classify every key as added / removed /
    # changed / unchanged between two table versions via one full
    # outer join on the key — the incremental-sync primitive (feeds
    # merge_upsert and the SCD2 builder). v2 is derived
    # deterministically from v1 so both engines see identical inputs:
    # doc_id % 11 == 0 rows are dropped (deletes), % 7 == 0 rows get
    # re-sourced (updates), and fresh keys are appended (inserts —
    # mapped to -doc_id - 1, disjoint from the non-negative base key
    # space at ANY row count; an additive offset would collide once
    # the table outgrows it).
    # Comparing a content hash (md5 of the row's business columns)
    # instead of column-by-column equality is the 100 TB form: one
    # fixed-width comparison regardless of schema width.
    "with v1 as (select doc_id, md5(concat(text, '|', source)) as h "
    "from documents), "
    "v2 as (select doc_id, md5(concat(text, '|', "
    "case when doc_id % 7 = 0 then 'moved' else source end)) as h "
    "from documents where doc_id % 11 <> 0 "
    "union all select -doc_id - 1 as doc_id, md5(concat(text, '|new')) "
    "as h from documents where doc_id % 13 = 0), "
    "j as (select coalesce(v1.doc_id, v2.doc_id) as doc_id, "
    "v1.h as h1, v2.h as h2 from v1 full outer join v2 "
    "on v1.doc_id = v2.doc_id) "
    "select doc_id, case when h1 is null then 'added' "
    "when h2 is null then 'removed' "
    "when h1 <> h2 then 'changed' else 'unchanged' end as change "
    "from j order by doc_id",
    None,  # identical SQL runs on DuckDB
    "CDC snapshot diff: added/removed/changed/unchanged per key via "
    "one full outer join on content hashes (fixed-width compare, "
    "schema-independent)",
)


_BENCH_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_BENCH_SQL = ", ".join(f"'{s}'" for s in _BENCH_SOURCES)


def _dd_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (paraphrase-robust) test-set decontamination certificate.

    ``dd_decontaminate`` flags training docs sharing an exact 8-gram
    with the benchmark; light paraphrase defeats it. The fuzzy variant
    flags corpus docs with minhash-LSH-found, exact-Jaccard-verified
    similarity >= 0.8 to any benchmark doc (sources src0-src4 stand in
    for the held-out benchmark). The production candidate path is the
    real banded-OPH pipeline; DuckDB independently recomputes ALL
    cross-side J >= 0.8 pairs over the shingle-sharing superset, so a
    hash match certifies cross-table LSH recall 1.0 at J >= 0.8 —
    the same guarantee ``dd_minhash_verified`` gives in-table.

    Returns flagged corpus docs with their benchmark-match counts.
    """
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        docs,
        minhash_candidate_pairs(docs, "doc_id", "text"),
        "doc_id",
        "text",
        threshold=0.8,
    )
    side = docs.select(
        "doc_id", F.col("source").isin(*_BENCH_SOURCES).alias("is_bench")
    )
    tagged = (
        pairs.join(
            side.select(F.col("doc_id").alias("id_a"), F.col("is_bench").alias("ba")),
            "id_a",
        )
        .join(
            side.select(F.col("doc_id").alias("id_b"), F.col("is_bench").alias("bb")),
            "id_b",
        )
        .filter(F.col("ba") != F.col("bb"))
    )
    corpus_id = F.when(F.col("ba"), F.col("id_b")).otherwise(F.col("id_a"))
    return (
        tagged.select(corpus_id.alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_matches"))
        .orderBy("doc_id")
    )


_reg(
    "dd_fuzzy_decontaminate",
    _dd_fuzzy_decontaminate,
    f"WITH {_SH_CTE}, "
    r"ex AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh), "
    r"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
    r" FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id), "
    f"p AS (SELECT CASE WHEN x.source IN ({_BENCH_SQL})"
    r" THEN c.id_b ELSE c.id_a END AS corpus_id"
    r" FROM cand c JOIN sh x ON x.doc_id = c.id_a"
    r" JOIN sh y ON y.doc_id = c.id_b"
    r" WHERE len(list_intersect(x.s, y.s))::DOUBLE"
    r"  / len(list_distinct(list_cat(x.s, y.s))) >= 0.8"
    f" AND ((x.source IN ({_BENCH_SQL})) <> (y.source IN ({_BENCH_SQL})))) "
    r"SELECT corpus_id AS doc_id, count(*)::BIGINT AS n_matches"
    r" FROM p GROUP BY corpus_id ORDER BY doc_id",
    "fuzzy decontamination certificate: corpus docs with verified "
    "J >= 0.8 to any benchmark doc (LSH candidates vs complete DuckDB "
    "recompute — cross-table recall 1.0)",
    oracle_max_sf=0.01,  # complete cross-recompute oracle is quadratic by design
)

_reg_sql(
    "x_winsorize",
    # Winsorization (outlier clamping to per-group percentile fences) —
    # the standard pre-normalization step before quality/length features
    # feed a sampler. Exact interpolated percentiles per source (one
    # groupBy), broadcast-joined back (the fence table is
    # group-cardinality-sized), clamp via least/greatest in codegen.
    # round(.,4) absorbs interpolation last-ulp noise (a_percentile
    # convention).
    "select d.doc_id, d.n_chars, "
    "cast(greatest(least(cast(d.n_chars as double), q.hi), q.lo) as double) "
    "as clamped from documents d join ("
    "select source, round(percentile(n_chars, 0.05), 4) as lo, "
    "round(percentile(n_chars, 0.95), 4) as hi "
    "from documents group by source) q on d.source = q.source "
    "order by d.doc_id",
    "SELECT d.doc_id, d.n_chars, "
    "greatest(least(CAST(d.n_chars AS DOUBLE), q.hi), q.lo) AS clamped "
    "FROM documents d JOIN ("
    "SELECT source, round(quantile_cont(n_chars, 0.05), 4) AS lo, "
    "round(quantile_cont(n_chars, 0.95), 4) AS hi "
    "FROM documents GROUP BY source) q ON d.source = q.source "
    "ORDER BY d.doc_id",
    "per-source winsorization: clamp to exact 5th/95th percentile "
    "fences (outlier-robust length feature)",
)


def _g_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the exact-Jaccard similarity graph.

    Edges are the oracle-able J >= 0.5 pairs from the complete
    shingle-sharing candidate superset (same edge set as
    ``dd_clusters_verified``); the operator is the degree-oriented
    wedge join (``operators/graph.py::triangle_list``). DuckDB closes
    the loop with a 3-way self-join on the same edge CTE — each
    triangle a < b < c appears exactly once on both sides.
    """
    from .operators.graph import triangle_list

    edges = _verified_edges(_docs(spark, sf_dir), threshold=0.5)
    return triangle_list(edges, "id_a", "id_b").orderBy("a", "b", "c")


_reg(
    "g_triangles",
    _g_triangles,
    f"WITH {_SH_CTE}, "
    r"ex AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh), "
    r"cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
    r" FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id), "
    r"e AS (SELECT c.id_a, c.id_b"
    r" FROM cand c JOIN sh x ON x.doc_id = c.id_a JOIN sh y ON y.doc_id = c.id_b"
    r" WHERE len(list_intersect(x.s, y.s))::DOUBLE"
    r"  / len(list_distinct(list_cat(x.s, y.s))) >= 0.5) "
    r"SELECT t1.id_a AS a, t1.id_b AS b, t2.id_b AS c "
    r"FROM e t1 JOIN e t2 ON t2.id_a = t1.id_b"
    r" JOIN e t3 ON t3.id_a = t1.id_a AND t3.id_b = t2.id_b "
    r"ORDER BY a, b, c",
    "triangle enumeration over exact-Jaccard >= 0.5 similarity edges "
    "(degree-oriented wedge joins vs a DuckDB 3-way self-join)",
    oracle_max_sf=0.01,  # 3-way self-join oracle infeasible beyond sf0.01
)

_reg_sql(
    "a_partial_rollup_merge",
    # Mergeable-partial certificate for PLAIN aggregates — the
    # incremental-ETL shape at 100 TB: per-partition partials
    # (count/sum/min/max) are computed independently (here: two halves
    # split by event_id parity, standing in for yesterday's persisted
    # rollup + today's new partition) and MERGED (counts and sums add,
    # min/max re-minimize, avg re-derives as merged-sum/merged-count).
    # The oracle aggregates the raw table directly in one pass — a hash
    # match certifies merge algebra == direct computation, the property
    # that lets a continuous rollup never rescan history. Companion to
    # the sketch-partial certificates (a_hll_sketch_rollup,
    # a_hist_quantile_rollup, a_cms_heavy_hitters) for exact aggregates.
    "select event_type, cast(sum(n) as bigint) as n_events, "
    "cast(sum(s) as double) as total_value, "
    "min(mn) as min_value, max(mx) as max_value, "
    "cast(sum(s) as double) / sum(n) as avg_value "
    "from (select event_type, event_id % 2 as half, count(*) as n, "
    "sum(cast(value as decimal(18,2))) as s, "
    "min(value) as mn, max(value) as mx "
    "from events group by event_type, event_id % 2) partials "
    "group by event_type order by event_type",
    "SELECT event_type, count(*)::BIGINT AS n_events, "
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value, "
    "min(value) AS min_value, max(value) AS max_value, "
    "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) "
    "AS avg_value "
    "FROM events GROUP BY event_type ORDER BY event_type",
    "mergeable-partial rollup certificate: per-half count/sum/min/max "
    "partials merged == one-pass direct aggregation",
)

_reg_sql(
    "x_skew_report",
    # Key-skew diagnostics: the distribution of per-key group sizes as a
    # log2 histogram (bucket = bit length of the count — integer-exact in
    # both engines via bin(), no float log). This is the profile you run
    # BEFORE choosing join/agg strategies at 100 TB: a long-tailed report
    # says salt-or-AQE, a flat one says hash-partition and move on. Two
    # shuffles total (key grouping, then 8-ish histogram rows).
    "select length(bin(c)) as bucket_bits, count(*) as n_keys, "
    "min(c) as min_count, max(c) as max_count, "
    "cast(sum(c) as bigint) as n_rows "
    "from (select user_id, count(*) as c from events group by user_id) t "
    "group by length(bin(c)) order by bucket_bits",
    "SELECT length(bin(c)) AS bucket_bits, count(*) AS n_keys, "
    "min(c) AS min_count, max(c) AS max_count, "
    "CAST(sum(c) AS BIGINT) AS n_rows "
    "FROM (SELECT user_id, count(*) AS c FROM events GROUP BY user_id) t "
    "GROUP BY length(bin(c)) ORDER BY bucket_bits",
    "key-skew report: log2 histogram of per-key group sizes "
    "(integer-exact buckets via binary bit length)",
)

_reg_sql(
    "a_mode",
    # MODE aggregate with a deterministic tiebreak (max count, then
    # min value) via ranked counting - engines disagree on native
    # mode() tie behavior, so the portable formulation IS the ranked
    # window; one (group, value) count shuffle + a per-group top-1.
    "select lang, word as mode_word, c as n from ("
    "select lang, word, c, row_number() over ("
    "partition by lang order by c desc, word) as rn from ("
    "select lang, word, count(*) as c from ("
    "select lang, explode(split(trim(lower(text)), '\\\\s+')) as word "
    "from documents) w group by lang, word) counted"
    ") ranked where rn = 1",
    r"SELECT lang, word AS mode_word, c AS n FROM ("
    r"SELECT lang, word, c, row_number() OVER ("
    r"PARTITION BY lang ORDER BY c DESC, word) AS rn FROM ("
    r"SELECT lang, word, count(*) AS c FROM ("
    r"SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) "
    r"AS word FROM documents) w GROUP BY lang, word) counted"
    r") ranked WHERE rn = 1",
    "per-group MODE (most frequent word per language, deterministic "
    "max-count/min-value tiebreak)",
)
