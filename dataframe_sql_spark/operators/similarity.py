"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): brute-force cosine top-k as the
exact baseline, and a random-hyperplane LSH variant as the scale path.

Scale design:
- brute-force: one map-side projection per row (zip_with dot product
  in codegen) + TakeOrderedAndProject top-k — no shuffle of vectors,
  only k rows reach the driver. Exact, O(n·d); right up to ~10^8 rows
  per query batch.
- LSH: signatures are computed map-side from a broadcast plane matrix;
  candidates come from hamming-ranked buckets so only a small rerank
  set pays the exact-cosine cost. Approximate, sublinear candidate
  cost; the 100 TB path (also the basis of an IVF-style variant:
  partition by signature prefix = coarse cell).
- knn join: broadcast the smaller side; per-row top-k via window over
  the blocked pair set.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_col",
    "cosine_topk",
    "lsh_signature_col",
    "lsh_topk",
    "ivf_default_cells",
    "ivf_assign_cells",
    "ivf_assign_cells_2level",
    "ivf_topk",
    "ivf_index_write",
    "ivf_kmeans_centroids",
    "ivf_topk_indexed",
    "knn_join_bruteforce",
    "ivf_probe_cells",
    "knn_join_ivf",
    "knn_join_cells",
    "knn_join_indexed",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_index_write",
    "ivfpq_topk_indexed",
    "kmeans_assign",
]

# PQ training sample size, shared by pq_train's default and the fused
# numpy build (_ivfpq_build_frames_np) so the two paths can never
# silently train on different samples (advisor note, r15).
PQ_TRAIN_SAMPLE = 2048


def cosine_col(vec: Column, query: list[float]) -> Column:
    """Cosine similarity of an array column against a constant query
    vector, as a single codegen'd expression (no UDF). The query enters
    as ONE array literal (not dim separate literal nodes): per-query
    cost is dominated by driver-side plan analysis, and collapsing
    literal-per-element trees measured 2.3× on the PQ path (same
    pattern throughout this module)."""
    q_norm = math.sqrt(sum(x * x for x in query)) or 1.0
    q = F.lit([float(x) for x in query])
    v = vec.cast("array<double>")
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    v_norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (v_norm * F.lit(q_norm))


def cosine_topk(
    df: DataFrame, vec_col: str, query: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine: ORDER BY score LIMIT k compiles to
    TakeOrderedAndProject (per-partition heaps + driver merge of k·p
    rows — no global sort shuffle). id tiebreak keeps it deterministic."""
    return (
        df.select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _planes(dim: int, num_bits: int, seed: int) -> list[list[float]]:
    """Deterministic random hyperplanes (LCG, no numpy dependency in
    the hot path; generated once on the driver, broadcast as literals)."""
    state = seed & 0x7FFFFFFF
    out: list[list[float]] = []
    for _ in range(num_bits):
        row = []
        for _ in range(dim):
            # Park–Miller LCG → uniform(-1, 1)
            state = (state * 48271) % 2147483647
            row.append(state / 2147483647.0 * 2.0 - 1.0)
        out.append(row)
    return out


def lsh_signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as a BIGINT (≤63 bits): bit i = sign
    of <vec, plane_i>. Pure expression — the plane matrix enters as one
    nested-array literal zipped against a power-of-two weight array
    (plan stays ~constant-size in num_bits; same dot products in the
    same order as the per-plane unrolled form, bit-identical output)."""
    v = vec.cast("array<double>")
    planes_lit = F.lit([[float(x) for x in plane] for plane in planes])
    pow2_lit = F.lit([1 << i for i in range(len(planes))])
    bits = F.zip_with(
        planes_lit,
        pow2_lit,
        lambda plane, p2: F.when(
            F.aggregate(
                F.zip_with(v, plane, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            p2.cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    num_bits: int = 16,
    rerank: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rank by hamming(signature, query_signature),
    keep ``rerank`` nearest buckets' members, then exact-cosine rerank.

    At 100 TB the signature column is precomputed/persisted and the
    hamming filter prunes partitions; here it's computed inline.
    """
    dim = len(query)
    planes = _planes(dim, num_bits, seed)
    q_sig = 0
    for i, plane in enumerate(planes):
        if sum(a * b for a, b in zip(query, plane)) > 0:
            q_sig |= 1 << i
    sig = lsh_signature_col(F.col(vec_col), planes)
    candidates = (
        df.withColumn("__sig", sig)
        .withColumn("__ham", F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig))))
        .orderBy(F.asc("__ham"), F.asc(id_col))
        .limit(rerank)
    )
    return (
        candidates.select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# Rows per cell the default sizing aims for. 128 balances the two cost
# terms at their round-4-calibrated ratio: per-call assignment/probe
# ranking costs N·cells (fewer cells = cheaper build; this constant
# reproduces the measured build curve in SCALE.md), while candidate
# volume per probe row is n_probe·occupancy (bounded at 4·128 = 512
# scored candidates per query at the default probe). An occupancy-32
# variant measured 2.7× slower end-to-end at stress scale 4 for no
# recall gain on this corpus.
IVF_TARGET_OCCUPANCY = 128

# Cell-score precision pin: both engines rank cells by the
# normalized-centroid dot product ROUNDED to this many decimals (with
# a deterministic lowest-cell tiebreak), so a few-ulp float divergence
# between Spark's fold and the oracle's list_inner_product cannot flip
# a near-tie and cascade into a different probe set / assignment.
# (Driver-side CONSTANT-query rankings use the rounded cosine instead
# — for one fixed query the two orders agree, and the oracle side
# mirrors whichever expression each path uses.) Residual risk: a true
# score within ~1e-8 of a rounding boundary (and the engines' half-way
# rounding modes differ: Spark/DuckDB round half away from zero,
# Python round() half-to-even) — measure-zero for real-valued scores.
CELL_SCORE_DECIMALS = 8


def ivf_default_cells(n_rows: int, occupancy: int = IVF_TARGET_OCCUPANCY) -> int:
    """Scale-correct IVF cell count: cells ∝ corpus size at a fixed
    per-cell occupancy target, so candidate volume per probe row
    (n_probe · occupancy) stays CONSTANT as the corpus grows — the
    linear configuration measured in tools/scale_stress.py::
    op_knn_join_ivf (a fixed n_cells silently degrades to quadratic
    occupancy, slope ≈2; a fixed n_probe/n_cells RATIO keeps the
    probed FRACTION constant, also quadratic).

    Integer ceiling math (``(n + occ - 1) // occ``) so a SQL oracle
    replays the exact same count. Clamped to [16, 4096]: the floor
    keeps tiny corpora meaningfully partitioned, the cap bounds the
    centroid literal / driver collect (4096·dim floats) — beyond that
    a hierarchical coarse quantizer is the right tool, not more flat
    cells."""
    return max(16, min(4096, (n_rows + occupancy - 1) // occupancy))


def _cos_py(q: list[float], c: list[float]) -> float:
    """Driver-side cosine, rounded to the same pinned precision the
    in-plan cell scoring uses (cross-engine near-tie stability)."""
    dot = sum(a * b for a, b in zip(q, c))
    nq = math.sqrt(sum(a * a for a in q)) or 1.0
    nc = math.sqrt(sum(b * b for b in c)) or 1.0
    return round(dot / (nq * nc), CELL_SCORE_DECIMALS)


def _ivf_centroids(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int
) -> list[list[float]]:
    """Deterministic centroid pick: the ``n_cells`` vectors with the
    smallest ``md5(id)`` — a seedless uniform sample that every rerun
    (and every engine) reproduces. Only n_cells·dim floats ever reach
    the driver; at 100 TB this is the precomputed index-build step
    (replace with distributed k-means there; the probe path is
    unchanged)."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    )
    return [list(r.v) for r in rows]


def ivf_kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    n_iters: int = 3,
    round_digits: int = 4,
    train_occupancy: int = 256,
) -> list[list[float]]:
    """Distributed spherical-k-means refinement of the md5-sample
    centroid init — the 100 TB index-build path the md5 sample's own
    docstring promises (this closes that gap; the probe path is
    untouched).

    Each Lloyd iteration is fully distributed: one codegen assignment
    projection (:func:`ivf_assign_cells` — max rounded dot against the
    literal centroid matrix, no UDF) followed by a ``posexplode`` +
    partial-aggregated per-(cell, dim) mean — the shuffle carries only
    n_cells·dim keys after map-side combine, and the ONLY driver
    materialization per iteration is the n_cells·dim updated means
    (same bound as the init itself). Determinism discipline matches
    :func:`kmeans_assign`: seedless md5 init, means rounded to
    ``round_digits`` so the centroid literals are bit-stable across
    reruns and engines, assignment ties break to the lowest cell.

    Cells that go empty in an iteration KEEP their previous centroid,
    so the list length — and therefore the persisted index's 0-based
    cell-id space and partition layout — is invariant across
    iterations.

    Training is SAMPLE-BOUNDED: each refinement pass assigns
    ~``train_occupancy`` rows per cell (a deterministic md5-coin
    sample, the repo's engine-portable RNG), not the whole corpus.
    Full-corpus refinement would cost rows·n_cells dot products per
    iteration, and with ``ivf_default_cells`` growing cells ∝ rows
    that is quadratic below the cell cap — measured log-log slope
    1.79 at 1×/4×/16× (SCALE.md). The sample pins training cost at
    ~train_occupancy·n_cells² regardless of corpus size (the standard
    coarse-quantizer discipline, cf. FAISS's per-centroid training
    caps), leaving the single unavoidable rows·n_cells assignment to
    the index writer. Small corpora (≤ the cap) train on everything —
    unchanged behavior, so small-data tests and replay fixtures are
    unaffected.
    """
    cents = _ivf_centroids(df, vec_col, id_col, n_cells)
    n_rows = df.count()
    cap = train_occupancy * n_cells
    if n_rows > cap:
        coin = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":ivfkm"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0)
        )
        train = df.filter(coin < F.lit(cap / n_rows))
    else:
        train = df
    for _ in range(max(0, n_iters - 1)):
        upd = (
            # r14: the numpy assignment kernel (bit-exact vs the
            # interpreted ivf_assign_cells — pytest-asserted) also
            # carries the training loop; the refinement passes were
            # the last interpreted rows×cells scoring on the build
            # path (guide §4.2)
            # (input pruned to the vector column: mapInPandas ships
            # every column it is handed — guide §4.1)
            ivf_assign_cells_np(
                train.select(F.col(vec_col)), vec_col, cents, cell_col="__cell"
            )
            .select(
                F.col("__cell"),
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "__dim", "__x"
                ),
            )
            .groupBy("__cell", "__dim")
            .agg(F.round(F.avg("__x"), round_digits).alias("__m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r[0], {})[r[1]] = r[2]
        dim = len(cents[0])
        cents = [
            [by_cell[c][d] for d in range(dim)] if c in by_cell else cents[c]
            for c in range(len(cents))
        ]
    return cents


def _train_centroids(
    df: DataFrame, vec_col: str, id_col: str, n_cells: int, method: str
) -> list[list[float]]:
    """Centroid training dispatch for the index builders:
    ``"sample"`` = deterministic md5 pick (cheap, oracle-replayable —
    the default every replay certificate pins); ``"kmeans"`` =
    :func:`ivf_kmeans_centroids` Lloyd refinement (tighter cells, the
    recommended build at real scale)."""
    if method == "sample":
        return _ivf_centroids(df, vec_col, id_col, n_cells)
    if method == "kmeans":
        return ivf_kmeans_centroids(df, vec_col, id_col, n_cells)
    raise ValueError(f"unknown centroid method {method!r} (sample|kmeans)")


def ivf_assign_cells(
    df: DataFrame, vec_col: str, centroids: list[list[float]], cell_col: str = "__cell"
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine), as a
    pure codegen expression over the literal centroid matrix — no UDF,
    no shuffle. At scale the result is persisted partitioned by cell so
    probes prune partitions.

    argmax_c cos(v, c) == argmax_c dot(v, c / |c|): the row norm is a
    positive constant across cells, so centroids are normalized
    driver-side and each cell costs one dot product — no per-row norm
    or sqrt at all (~2× less arithmetic than cosine per cell; an
    earlier round-5 variant scored the full cosine per cell and
    measured 2.2× slower end-to-end on the IVF-PQ build). Each cell's
    score is that dot ROUNDED to :data:`CELL_SCORE_DECIMALS` — the
    pinned precision a SQL oracle reproduces exactly with
    ``round(list_inner_product(v, c_normalized), 8)`` (normalizing the
    centroid in SQL), so near-ulp float divergence between the two
    engines' expressions cannot flip a near-tie assignment (rounded
    ties break to the lowest cell on both sides via
    ``array_position``'s first-match)."""

    def _normed(c: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    v = F.col(vec_col).cast("array<double>")
    cents_lit = F.lit([_normed(c) for c in centroids])
    sims = F.transform(
        cents_lit,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(v, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
            ),
            CELL_SCORE_DECIMALS,
        ),
    )
    return df.withColumn(
        cell_col, (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    )


def ivf_assign_cells_np(
    df: DataFrame, vec_col: str, centroids: list[list[float]], cell_col: str = "__cell"
) -> DataFrame:
    """Numpy ``mapInPandas`` form of :func:`ivf_assign_cells` —
    bit-exact (pytest-asserted): per cell, the rounded sequential-fold
    dot against the driver-normalized centroid (HALF_UP/shortest-repr
    rounding via npsig.round_half_up_np), argmax under the
    Double.compare total order (ties to the lowest cell). Replaces the
    rows×cells interpreted-HOF scoring — the dominant index-build term
    at scale — and the per-call centroid-literal tree construction
    (guide §4.2)."""
    import math as _math

    import numpy as np

    from ..functions.npsig import round_half_up_np

    def _normed(c: list[float]) -> list[float]:
        n = _math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    cn = np.array([_normed(c) for c in centroids], np.float64)
    dim = cn.shape[1]

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            n = len(V)
            cell = np.empty(n, np.int32)
            step = max(1, (4 << 20) // max(1, len(cn) * dim))
            for s in range(0, n, step):
                dots = (
                    np.cumsum(V[s : s + step, None, :] * cn[None, :, :], axis=2)[
                        :, :, -1
                    ]
                    + 0.0
                )
                sims = round_half_up_np(dots, CELL_SCORE_DECIMALS)
                cell[s : s + step] = np.argmax(_f64_order_key(sims), axis=1)
            out = pdf.copy()
            out[cell_col] = cell.astype(np.int32)
            yield out

    schema = (
        ",".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        + f",`{cell_col}` int"
    )
    return df.mapInPandas(kernel, schema=schema)


def ivf_probe_cells_np(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    n_probe: int,
    cell_col: str = "__cell",
) -> DataFrame:
    """Numpy ``mapInPandas`` form of :func:`ivf_probe_cells` —
    bit-exact probe sets (pytest-asserted): same rounded dots as
    :func:`ivf_assign_cells_np`, then the top-``n_probe`` cells under
    the expression path's comparator semantics (rounded sim descending
    with primitive float comparison — ``x + 0.0`` collapses the ±0.0
    pair exactly as ``a > b`` treats it — ties to the lower cell id),
    exploded to one output row per probed cell."""
    import math as _math

    import numpy as np

    from ..functions.npsig import round_half_up_np

    def _normed(c: list[float]) -> list[float]:
        n = _math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    cn = np.array([_normed(c) for c in centroids], np.float64)
    n_cells, dim = cn.shape
    keep = min(n_probe, n_cells)

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            n = len(V)
            probes = np.empty((n, keep), np.int32)
            step = max(1, (4 << 20) // max(1, n_cells * dim))
            for s in range(0, n, step):
                dots = (
                    np.cumsum(V[s : s + step, None, :] * cn[None, :, :], axis=2)[
                        :, :, -1
                    ]
                    + 0.0
                )
                sims = round_half_up_np(dots, CELL_SCORE_DECIMALS) + 0.0
                # argsort(-sims) stable == sim desc, lower cell on ties
                order = np.argsort(-sims, axis=1, kind="stable")
                probes[s : s + step] = order[:, :keep]
            rep = pdf.loc[pdf.index.repeat(keep)].reset_index(drop=True)
            rep[cell_col] = probes.reshape(-1).astype(np.int32)
            yield rep

    schema = (
        ",".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        + f",`{cell_col}` int"
    )
    return df.mapInPandas(kernel, schema=schema)


def ivf_assign_cells_2level(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    cell_col: str = "__cell",
) -> DataFrame:
    """Two-level (hierarchical) coarse-quantizer assignment: the
    O(rows·√cells) answer to flat assignment's O(rows·cells) — the
    "next rung" SCALE.md's round-8 slope analysis names. Flat
    assignment with `ivf_default_cells` growing cells ∝ rows costs
    rows²/occupancy below the 4096-cell cap (measured log-log slope
    1.77) and rows·4096 above it; this path costs rows·~2√cells
    everywhere (slope ~1.5 pre-cap, 32× fewer dot products per row at
    the cap).

    Construction (all driver-side over the ≤4096·dim centroid matrix,
    then pure codegen per row — no UDF, no shuffle):

    - √C super-centroids picked deterministically from the cell
      centroids (smallest md5 of the cell index — the same seedless
      discipline as `_ivf_centroids`), then each CELL is routed to its
      nearest super-centroid, giving a children table
      ``super → [cell ids]`` (driver math over C·dim floats);
    - per row: argmax rounded-dot over the √C super-centroids, then
      argmax rounded-dot over that super-cell's children only — two
      nested-literal lookups, ties to the lowest index at both levels.

    The assignment is APPROXIMATE at cell boundaries (a row whose true
    nearest cell hangs under a different super-cell lands in its best
    reachable cell instead) — the standard hierarchical-IVF trade:
    partial-probe recall can dip slightly, while full probe remains
    exact because correctness never depended on assignment (the probe
    scans every cell and the exact-cosine rerank decides; pytest-gated
    like the k-means build). Deterministic: pure function of the
    centroid matrix, so reruns and incremental appends agree.
    """

    def _normed(c: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    n_cells = len(centroids)
    n_super = max(1, math.isqrt(n_cells))
    # deterministic super-centroid pick: smallest md5("s:<cell idx>")
    order = sorted(
        range(n_cells), key=lambda i: hashlib.md5(f"s:{i}".encode()).hexdigest()
    )
    super_ids = sorted(order[:n_super])
    normed = [_normed(c) for c in centroids]
    supers = [normed[i] for i in super_ids]

    def _dot(a: list[float], b: list[float]) -> float:
        return round(sum(x * y for x, y in zip(a, b)), CELL_SCORE_DECIMALS)

    children: list[list[int]] = [[] for _ in range(n_super)]
    for cell in range(n_cells):
        best = max(
            range(n_super), key=lambda s: (_dot(normed[cell], supers[s]), -s)
        )
        children[best].append(cell)
    # an empty super-cell would make element_at return an empty array
    # and the row a null cell; give it its own seed cell so every
    # super-cell resolves (the seed stays reachable via its true super
    # too — duplicate membership only widens the search)
    for s, kids in enumerate(children):
        if not kids:
            kids.append(super_ids[s])

    v = F.col(vec_col).cast("array<double>")
    supers_lit = F.lit(supers)
    kids_ids_lit = F.lit([[int(c) for c in kids] for kids in children])
    kids_cents_lit = F.lit([[normed[c] for c in kids] for kids in children])

    def scores(cands: Column) -> Column:
        return F.transform(
            cands,
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(v, c, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                CELL_SCORE_DECIMALS,
            ),
        )

    s_scores = scores(supers_lit)
    s_pos = F.array_position(s_scores, F.array_max(s_scores)).cast("int")
    kid_cents = F.element_at(kids_cents_lit, s_pos)
    k_scores = scores(kid_cents)
    k_pos = F.array_position(k_scores, F.array_max(k_scores)).cast("int")
    return df.withColumn(
        cell_col, F.element_at(F.element_at(kids_ids_lit, s_pos), k_pos).cast("int")
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_cells: int | None = None,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_cells`` centroid cells, probe only the ``n_probe`` cells whose
    centroids are most similar to the query, exact-cosine rerank inside
    them.

    ``n_cells`` defaults to :func:`ivf_default_cells` over a cheap
    ``count()`` — cells ∝ corpus at fixed occupancy, the configuration
    whose scan cost stays ~n_probe·occupancy per query at any scale
    (a hand-fixed cell count silently degrades toward a full scan as
    the corpus grows). With ``n_probe == n_cells`` this degenerates to
    exact brute force (the pytest recall gate exploits that). The cell
    filter is a codegen predicate (and a partition-pruning one once
    the cell column is persisted). Probe-cell ranking uses the pinned
    rounded cosine (ties → lowest cell), matching the in-plan scoring.
    """
    if n_cells is None:
        n_cells = ivf_default_cells(df.count())
    centroids = _ivf_centroids(df, vec_col, id_col, n_cells)
    probe = sorted(
        range(len(centroids)), key=lambda i: (-_cos_py(query, centroids[i]), i)
    )[:n_probe]
    # r14: assignment via the bit-exact numpy kernel (same cells,
    # pytest-asserted vs ivf_assign_cells) — drops the rows×cells
    # interpreted-HOF scoring and the per-call centroid-literal tree
    # construction from the per-query path (guide §4.2).
    assigned = ivf_assign_cells_np(df, vec_col, centroids)
    return (
        assigned.filter(F.col("__cell").isin(probe))
        .select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def knn_join_bruteforce(
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_id: str = "id_a",
    right_id: str = "id_b",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """For every left row, its k nearest right rows by cosine.

    right is broadcast when small (Catalyst decides under the 64 MB
    threshold); ``block_col`` turns the cross product into a per-block
    join for the large-large case. Top-k per left id via window.
    """
    lv = left.select(
        F.col(left_id), F.col(vec_col).cast("array<double>").alias("__lv"),
        *([F.col(block_col).alias("__blk_l")] if block_col else []),
    )
    rv = right.select(
        F.col(right_id), F.col(vec_col).cast("array<double>").alias("__rv"),
        *([F.col(block_col).alias("__blk_r")] if block_col else []),
    )
    cond = F.lit(True) if not block_col else (F.col("__blk_l") == F.col("__blk_r"))
    dot = F.aggregate(
        F.zip_with("__lv", "__rv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pairs = (
        lv.join(rv, cond)
        .withColumn("score", dot / (norm(F.col("__lv")) * norm(F.col("__rv"))))
        .select(left_id, right_id, "score")
    )
    w = Window.partitionBy(left_id).orderBy(F.desc("score"), F.asc(right_id))
    return pairs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def ivf_probe_cells(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    n_probe: int,
    cell_col: str = "__cell",
) -> DataFrame:
    """Per-row top-``n_probe`` nearest centroid cells, EXPLODED to one
    row per (row, probed cell) — the query-side assignment of the
    cell-keyed kNN join (:func:`knn_join_ivf`).

    Pure codegen, no UDF: the normalized centroid matrix enters as a
    single nested-array literal (same matrix-literal convention as the
    PQ codebooks — one literal, not a per-element expression tree),
    per-cell dot products are a ``transform``/``aggregate`` pass, and
    the top-``n_probe`` pick is an ``array_sort`` over (sim, cell)
    structs with a deterministic comparator (higher sim first, lower
    cell id on ties). Cell scores are normalized-centroid dots rounded
    to :data:`CELL_SCORE_DECIMALS` — the same pinned precision
    :func:`ivf_assign_cells` uses, so an oracle's
    ``round(list_inner_product(v, c_normalized), 8)`` ranking replays
    the probe set exactly (near-ties cannot flip across engines). The
    similarity array is materialized in its own projection first —
    lambda-bearing expressions are excluded from Spark's subexpression
    elimination, so referencing it twice unmaterialized would
    recompute every dot product.
    """

    def _normed(c: list[float]) -> list[float]:
        n = math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    v = F.col(vec_col).cast("array<double>")
    cents_lit = F.lit([_normed(c) for c in centroids])
    sims = F.transform(
        cents_lit,
        lambda c: F.round(
            F.aggregate(
                F.zip_with(v, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
            ),
            CELL_SCORE_DECIMALS,
        ),
    )
    idxed = F.transform(
        F.col("__sims"), lambda s, i: F.struct(s.alias("s"), i.alias("i"))
    )
    comp = lambda a, b: (  # noqa: E731
        F.when(a["s"] > b["s"], F.lit(-1))
        .when(a["s"] < b["s"], F.lit(1))
        .otherwise(
            F.signum(a["i"].cast("double") - b["i"].cast("double")).cast("int")
        )
    )
    top = F.slice(F.array_sort(idxed, comp), 1, n_probe)
    return (
        df.withColumn("__sims", sims)
        .withColumn("__probe", top)
        .withColumn(
            cell_col,
            F.explode(F.transform("__probe", lambda st: st["i"].cast("int"))),
        )
        .drop("__sims", "__probe")
    )


def knn_join_ivf(
    left: DataFrame,
    right: DataFrame,
    k: int,
    left_id: str = "id_a",
    right_id: str = "id_b",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    n_probe: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Cell-keyed kNN join: for every left row, its ``k`` nearest
    right rows by cosine, computed as an EQUI-join on IVF cells —
    never a cartesian product.

    The 100-TB shape of the kNN join: right rows are assigned to their
    nearest of ``n_cells`` centroids (one cell each), left rows
    explode onto their ``n_probe`` nearest cells, and candidates are
    the cell-key equi-join of the two — a hash join whose shuffle
    moves (id, vector, cell) rows keyed by cell, with per-left top-k
    by window. Candidate volume is ~``n_probe/n_cells`` of all pairs;
    at scale, cells also serve as the partition key for the persisted
    index (:func:`ivf_index_write`), so the probe side prunes
    partitions.

    With ``n_probe == n_cells`` (the default) every query probes every
    cell, the candidate set is EXACTLY all pairs (each right row lives
    in exactly one cell, so no pair duplicates either), and the result
    is provably identical to :func:`knn_join_bruteforce` — while the
    plan is still the hash equi-join. The differential oracle
    certifies the full-probe config; partial-probe recall is
    pytest-gated like :func:`ivf_topk`'s.

    ``exclude_self`` drops ``left_id == right_id`` candidate pairs
    before ranking (the self-join kNN-graph build).

    ``n_cells`` defaults to :func:`ivf_default_cells` over a cheap
    ``right.count()`` — the cells-∝-N / fixed-n_probe policy as code,
    not advice: a hand-fixed cell count makes occupancy (and so
    candidate volume) grow with the corpus, the measured slope-2.0
    trap in tools/scale_stress.py. Pass ``n_cells`` explicitly only
    when replaying a pinned configuration (e.g. an oracle).
    """
    if n_cells is None:
        n_cells = ivf_default_cells(right.count())
    n_probe = n_cells if n_probe is None else n_probe
    centroids = _ivf_centroids(right, vec_col, right_id, n_cells)
    # r14: assignment/probe via the bit-exact numpy kernels (same
    # rounded scores, same tie semantics — pytest-asserted); the
    # rows×cells interpreted scoring was the dominant per-call cost.
    rv = ivf_assign_cells_np(
        right.select(
            F.col(right_id), F.col(vec_col).cast("array<double>").alias("__rv")
        ),
        "__rv",
        centroids,
    )
    lv = ivf_probe_cells_np(
        left.select(
            F.col(left_id), F.col(vec_col).cast("array<double>").alias("__lv")
        ),
        "__lv",
        centroids,
        n_probe,
    )
    return knn_join_cells_cogrouped(
        lv, rv, k, left_id, right_id, exclude_self=exclude_self
    )


def knn_join_cells_cogrouped(
    lv: DataFrame,
    rv: DataFrame,
    k: int,
    left_id: str = "id_a",
    right_id: str = "id_b",
    exclude_self: bool = False,
) -> DataFrame:
    """Cell-cogrouped variant of :func:`knn_join_cells`: instead of a
    cell equi-join whose output carries BOTH 64-dim vectors on every
    candidate row (candidates = probes × occupancy — at sf0.1 already
    1M pairs ≈ 1 GB through any downstream operator), the two sides are
    cogrouped on the cell key and each cell's pair scores are computed
    in one numpy kernel — every vector crosses the boundary ONCE per
    cell (nl + nr rows, not nl × nr), the §8 "move heavy bytes once"
    shape. Scores replicate the interpreted fold BIT-FOR-BIT
    (elementwise products + sequential cumsum, sqrt, same division —
    pytest-asserted against :func:`knn_join_cells` output), so ranking
    and the oracle hash are unchanged. Shuffles are identical to the
    join form (both sides exchange on the bounded cell key; the
    per-left top-k window shuffles (id, id, score) rows). Memory is
    bounded by chunking the probe side so each products block stays
    ~32 MB regardless of occupancy.

    Used by :func:`knn_join_ivf` (assignments computed in-plan). The
    persisted-index path (:func:`knn_join_indexed`) keeps the
    equi-join form: its cell key is a parquet partition column and the
    join is what lets dynamic partition pruning skip unprobed cell
    directories — a cogroup would read every cell.
    """
    import numpy as np
    import pandas as pd

    a_type = dict(zip(lv.schema.names, lv.schema))[left_id].dataType.simpleString()
    b_type = dict(zip(rv.schema.names, rv.schema))[right_id].dataType.simpleString()
    schema = f"`{left_id}` {a_type}, `{right_id}` {b_type}, score double"

    def score_cell(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left) or not len(right):
            return pd.DataFrame({left_id: [], right_id: [], "score": []})
        A = np.stack([np.asarray(v, np.float64) for v in left["__lv"]])
        B = np.stack([np.asarray(v, np.float64) for v in right["__rv"]])
        ids_a = left[left_id].to_numpy()
        ids_b = right[right_id].to_numpy()
        # r14: pre-truncate to the k best per (left row, cell) INSIDE
        # the kernel (guide §2.3, aggregate-before-shuffle): a candidate
        # dropped here has ≥ k better candidates in its own cell under
        # the window's exact total order (score desc, id_b asc), hence
        # ≥ k better globally — the per-left top-k window downstream
        # returns the identical rows from nl·n_probe·k inputs instead
        # of the full nl×nr candidate stream. Order replication: right
        # side sorted by id_b once, so within a row equal scores
        # tie-break by column index; a stable argsort on ~okey (okey =
        # the Double.compare-monotone int64 key; bitwise NOT reverses
        # it without overflow) is exactly (score desc, id_b asc).
        border = np.argsort(ids_b, kind="stable")
        B, ids_b = B[border], ids_b[border]
        # norms: sequential fold of squares, exactly the hoisted-JVM
        # sqrt(aggregate(...)) (squares are +0.0, so no zero-sign edge)
        ln = np.sqrt(np.cumsum(A * A, axis=1)[:, -1] + 0.0)
        rn = np.sqrt(np.cumsum(B * B, axis=1)[:, -1] + 0.0)
        nl, d = A.shape
        nr = len(B)
        kk = min(k, nr)
        step = max(1, (4 << 20) // max(1, nr * d))  # ~32 MB f64 blocks
        outs = []
        for s in range(0, nl, step):
            As = A[s : s + step]
            # sequential cumsum over the dim axis == the interpreted
            # left fold; trailing +0.0 mirrors the fold's 0.0 seed
            dots = np.cumsum(As[:, None, :] * B[None, :, :], axis=2)[:, :, -1] + 0.0
            score = dots / (ln[s : s + step, None] * rn[None, :])
            okey = _f64_order_key(score)
            if exclude_self:
                # self rows sink below every real candidate and are
                # dropped after selection (scores are finite, so
                # int64 min never collides with a real key)
                okey = np.where(
                    ids_b[None, :] == ids_a[s : s + step, None],
                    np.int64(-(2**63)),
                    okey,
                )
            sel = np.argsort(~okey, axis=1, kind="stable")[:, :kk]
            srows = np.arange(len(As))[:, None]
            ia = np.repeat(ids_a[s : s + step], kk)
            ib = ids_b[sel].ravel()
            sc = score[srows, sel].ravel()
            if exclude_self:
                keep = ia != ib
                ia, ib, sc = ia[keep], ib[keep], sc[keep]
            outs.append(pd.DataFrame({left_id: ia, right_id: ib, "score": sc}))
        return pd.concat(outs, ignore_index=True)

    scored = (
        lv.groupBy("__cell")
        .cogroup(rv.groupBy("__cell"))
        .applyInPandas(score_cell, schema=schema)
    )
    w = Window.partitionBy(left_id).orderBy(F.desc("score"), F.asc(right_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_join_cells(
    lv: DataFrame,
    rv: DataFrame,
    k: int,
    left_id: str = "id_a",
    right_id: str = "id_b",
    exclude_self: bool = False,
) -> DataFrame:
    """JOIN stage of the cell-keyed kNN join over PRE-ASSIGNED frames:
    ``lv`` = probe rows exploded onto cells (``__cell`` +
    ``__lv`` vector), ``rv`` = corpus rows with their cell (``__cell``
    + ``__rv``). This is the probe-time path when assignments come
    from a persisted index (:func:`ivf_index_write` stores exactly the
    ``rv`` shape partitioned by cell) — the per-call centroid scoring
    in :func:`knn_join_ivf` is the index-BUILD cost, amortized across
    probes. Cost is candidate volume (|lv|·occupancy) + one window
    per left id: linear in corpus size when cells ∝ N and n_probe is
    fixed (see tools/scale_stress.py::op_knn_join_ivf for the
    measured decomposition and the two quadratic mis-configurations).
    """
    # merge hint on the index side: both sides carry vector arrays whose
    # width the estimator cannot see (ArrayType.defaultSize = one
    # element), so a corpus-scaled rv can sit under the broadcast
    # threshold while its HashedRelation is GBs — the round-10
    # broadcast_audit finding. Sort-merge on the bounded cell key is
    # the spill-safe shape; at small SF AQE's coalescing keeps the two
    # extra sorts cheap.
    #
    # r14: the vector norms are hoisted BELOW the join — one
    # interpreted-HOF pass per input row instead of one per CANDIDATE
    # (candidates = rows × n_probe × occupancy; the per-pair projection
    # previously evaluated dot + BOTH norms, ~3× the lambda evals of
    # the dot alone). Same expression over the same array → identical
    # doubles → identical ranking; only the dot stays pair-side.
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    lvn = lv.withColumn("__ln", norm(F.col("__lv")))
    rvn = rv.withColumn("__rn", norm(F.col("__rv")))
    pairs = lvn.join(rvn.hint("merge"), "__cell")
    if exclude_self:
        pairs = pairs.filter(F.col(left_id) != F.col(right_id))
    # per-pair dot via the Arrow-batched sequential-fold kernel —
    # bit-identical to the interpreted aggregate(zip_with(...)) fold it
    # replaces (functions/npsig.py::seq_dot_np, pytest-asserted), at a
    # fraction of the per-candidate CPU (guide §4.2).
    from ..functions.npsig import seq_dot_vec

    dot = seq_dot_vec(F.col("__lv"), F.col("__rv"))
    scored = pairs.withColumn(
        "score", dot / (F.col("__ln") * F.col("__rn"))
    ).select(left_id, right_id, "score")
    w = Window.partitionBy(left_id).orderBy(F.desc("score"), F.asc(right_id))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# product quantization (PQ)
# --------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    n_sub: int = 4,
    n_codes: int = 16,
    sample: int = PQ_TRAIN_SAMPLE,
    iters: int = 5,
    round_digits: int | None = None,
) -> list[list[list[float]]]:
    """Train PQ codebooks: ``n_sub`` subspaces × ``n_codes`` centroids
    each, k-means on a deterministic bounded sample.

    ``round_digits`` rounds every centroid coordinate after each
    update — the same trajectory-pinning discipline as
    :func:`kmeans_assign`, letting a SQL oracle replay the training
    bit-for-bit (`sim_ann_pq_verified`). Production default is None
    (unrounded; nothing downstream depends on cross-engine replay of
    the production books).

    This is the index-BUILD step: only ``sample``·dim floats reach the
    driver (seedless md5-ordered sample, reproducible across runs and
    engines), and the k-means runs on that sample in numpy. At 100 TB
    the build stays exactly this shape — training on a few thousand
    vectors is standard PQ practice (codebooks converge long before
    the corpus is exhausted); encode/scan never collect anything.

    Returns ``codebooks[s][c] = centroid vector`` (len dim/n_sub).
    """
    assert dim % n_sub == 0, "dim must divide evenly into n_sub subspaces"
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    import numpy as np

    X = np.array([r.v for r in rows])  # (n, dim)
    return _pq_train_np(X, dim, n_sub, n_codes, iters, round_digits)


def _pq_train_np(
    X,
    dim: int,
    n_sub: int,
    n_codes: int,
    iters: int = 5,
    round_digits: int | None = None,
) -> list[list[list[float]]]:
    """The numpy k-means loop behind :func:`pq_train`, factored out so
    a caller that already holds the (md5-ordered) sample matrix can
    train without a second Spark job. Bit-identical to training on the
    collected sample: same init, same update order, same rounding."""
    import numpy as np

    sub = dim // n_sub
    books: list[list[list[float]]] = []
    for s in range(n_sub):
        Xs = X[:, s * sub : (s + 1) * sub]
        # deterministic init: first n_codes sample rows (md5 order).
        # When pinning, round the INIT too — an empty cluster keeps its
        # centroid through every iteration, so an unrounded init would
        # leak an unrounded row into the final book while the SQL
        # oracle's carry-forward (coalesce over rounded cb0) stays on
        # the grid; rounding both makes empty-code carry-forward
        # engine-identical instead of relying on every init code
        # capturing a member.
        C = Xs[:n_codes].copy()
        if round_digits is not None:
            C = np.round(C, round_digits)
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = Xs[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
            if round_digits is not None:
                C = np.round(C, round_digits)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    code_col: str = "__pq",
    score_digits: int | None = None,
) -> DataFrame:
    """Attach the PQ code (array<int>, one code per subspace) as a pure
    codegen expression over the literal codebooks — no UDF, no shuffle.

    The encoded column is what gets persisted at scale: n_sub bytes a
    row instead of dim·4, a 64× compression at (64-dim float32,
    4×16 PQ), and every later query scans codes, not vectors.
    """
    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    # two projections: materialize each subvector once as an attribute,
    # then score — otherwise every one of the n_codes dot products
    # re-evaluates its F.slice (lambda-bearing expressions are excluded
    # from subexpression elimination; measured ~2× at sf0.1)
    sliced = df.withColumns(
        {f"__sv{s}": F.slice(v, s * sub + 1, sub) for s in range(n_sub)}
    )
    codes = []
    for s in range(n_sub):
        vs = F.col(f"__sv{s}")
        # argmin over squared L2: ||x-c||² = ||x||² - 2<x,c> + ||c||²;
        # ||x||² is constant across codes, so rank by <x,c> - ||c||²/2.
        # The codebook enters as ONE nested-array literal iterated by
        # zip_with, not n_codes separate expression subtrees: per-call
        # wall time is dominated by driver-side plan analysis of the
        # literal-laden tree (execution is ~0.1 s warm), and collapsing
        # n_sub × n_codes × sub literal nodes into n_sub array literals
        # measured 2.3× faster end-to-end at 8×16×8 (2.7 s → 1.2 s per
        # fresh-plan call, identical output hash).
        books_lit = F.lit([[float(x) for x in c] for c in codebooks[s]])
        norms_lit = F.lit(
            [float(sum(x * x for x in c)) / 2.0 for c in codebooks[s]]
        )
        scores = F.zip_with(
            books_lit,
            norms_lit,
            lambda c, nrm: F.aggregate(
                F.zip_with(vs, c, lambda a, b: a * b), -nrm, lambda acc, x: acc + x
            ),
        )
        if score_digits is not None:
            # pin the argmax the way CELL_SCORE_DECIMALS pins IVF cell
            # scores: Spark's fold (acc starts at -||c||²/2) and the
            # oracle's list_inner_product−norm/2 associate differently,
            # so a last-ulp gap between two CODES' scores could flip
            # the assignment; on the 1e-8 grid both engines agree and
            # ties break to the LOWEST code on both sides
            # (array_position-of-max here, ORDER BY score DESC, c in
            # SQL). Production default stays None (unrounded).
            scores = F.transform(scores, lambda x: F.round(x, score_digits))
        codes.append((F.array_position(scores, F.array_max(scores)) - 1).cast("int"))
    return sliced.withColumn(code_col, F.array(*codes)).drop(
        *[f"__sv{s}" for s in range(n_sub)]
    )


def pq_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_sub: int = 4,
    n_codes: int = 16,
    rerank: int = 100,
    codebooks: list[list[list[float]]] | None = None,
    score_digits: int | None = None,
) -> DataFrame:
    """PQ approximate top-k with asymmetric distance computation (ADC)
    and exact rerank.

    ``score_digits`` pins the encode argmax and the ADC rerank cut to
    a fixed decimal grid on this side (the replay oracle rounds the
    same two rank keys), so a cross-engine last-ulp difference cannot
    flip a code assignment or the rerank boundary — the same
    discipline as CELL_SCORE_DECIMALS for IVF cell scores. Production
    default is None (nothing downstream replays production scans).

    The query is never quantized: the driver precomputes a lookup
    table LUT[s][c] = <query_s, centroid_{s,c}> (n_sub·n_codes floats)
    and the scan scores each row as Σ_s LUT[s][code_s] — n_sub
    element_at calls per row against literal arrays, the cheapest
    possible scan over a compressed index. The ``rerank`` best
    candidates then pay the exact cosine.
    """
    if codebooks is None:
        codebooks = pq_train(df, vec_col, id_col, dim=len(query), n_sub=n_sub, n_codes=n_codes)
    sub = len(codebooks[0][0])
    # production (unrounded) encode goes through the bit-exact numpy
    # kernel; the pinned replay configs keep the expression path.
    if score_digits is None:
        encoded = pq_encode_frames_np(df, vec_col, codebooks)
    else:
        encoded = pq_encode(df, vec_col, codebooks, score_digits=score_digits)
    approx = F.lit(0.0)
    for s in range(len(codebooks)):
        qs = query[s * sub : (s + 1) * sub]
        lut = F.lit(
            [float(sum(a * b for a, b in zip(qs, c))) for c in codebooks[s]]
        )
        approx = approx + F.element_at(lut, F.element_at(F.col("__pq"), s + 1) + 1)
    if score_digits is not None:
        # the oracle's ADC total is a SQL SUM over a join (unspecified
        # addition order) of its own LUT dot products — round the rank
        # key on both sides so the rerank-100 boundary is grid-stable
        approx = F.round(approx, score_digits)
    candidates = (
        encoded.withColumn("__adc", approx)
        .orderBy(F.desc("__adc"), F.asc(id_col))
        .limit(rerank)
    )
    return (
        candidates.select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivf_index_write(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
    centroids: str = "sample",
    assign: str = "flat",
) -> list[list[float]]:
    """Build and persist the IVF index: assign every vector to its
    nearest centroid cell and write parquet PARTITIONED BY cell, with
    the centroid matrix stored alongside (``_centroids.json`` — the
    leading underscore keeps Spark's reader from treating it as data).

    This is the deployment shape for ANN at scale: the expensive
    assignment pass runs once, and every probe afterwards reads only
    ``n_probe`` of ``n_cells`` partition directories — partition
    pruning at the file listing level, before a single byte of the
    skipped cells is opened (gated by
    ``test_ann_index.py::test_indexed_probe_prunes_partitions``).
    Incremental ingest appends new vectors assigned against the SAME
    persisted centroids, mirroring dd_incremental's
    never-re-signature-history rule.

    ``centroids="kmeans"`` trains the cell centers with the
    distributed Lloyd refinement (:func:`ivf_kmeans_centroids`)
    instead of the raw md5 sample — tighter, better-balanced cells at
    the cost of ``n_iters - 1`` extra assignment+reduce passes at
    build time. Probe-side code is identical either way (the trained
    matrix is what lands in ``_centroids.json``), and full-probe
    results are centroid-independent (pytest-gated).

    ``assign="2level"`` routes the corpus assignment pass through the
    hierarchical coarse quantizer (:func:`ivf_assign_cells_2level`) —
    O(rows·√cells) instead of O(rows·cells), the build-cost answer
    when cells track corpus size (SCALE.md round-8 slope analysis).
    Cell-boundary rows may land in a near-best cell (partial-probe
    recall trade); full probe stays exact.
    """
    import json
    import os

    if n_cells is None:
        n_cells = ivf_default_cells(df.count())
    cents = _train_centroids(df, vec_col, id_col, n_cells, centroids)
    # flat assignment via the bit-exact numpy kernel (r14): identical
    # cells, vectorized rows×cells scoring (the dominant build term).
    assigner = {
        "flat": ivf_assign_cells_np,
        "2level": ivf_assign_cells_2level,
    }[assign]
    assigned = assigner(df, vec_col, cents, cell_col="cell")
    # r14: shuffle by cell BEFORE the partitioned write (guide §6).
    # Without it every map task writes a file into every cell
    # directory it touches — M·cells files (measured: 1004 files for
    # 1801 rows/16 cells at sf0.1, and M·4096 at the cell cap). One
    # exchange of the payload for a run-once build buys exactly one
    # occupancy-sized file per cell, and every partition-pruned probe
    # afterwards lists/opens one file per probed cell instead of M.
    # The shuffle partition count follows the session's shuffle
    # parallelism (AQE-coalesced), not a local constant.
    assigned.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(cents, f)
    return cents


def knn_join_indexed(
    spark,
    path: str,
    left: DataFrame,
    k: int,
    left_id: str = "id_a",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Batch kNN join served from the persisted IVF index
    (:func:`ivf_index_write`): left rows rank the STORED centroids
    (pure expression), explode onto their ``n_probe`` nearest cells,
    and equi-join the index table on its ``cell`` partition column —
    so Spark's dynamic partition pruning can skip unprobed cell
    directories at runtime when the probe set is selective, and the
    only per-call cost is probe-side (the corpus assignment was paid
    once at index build). This is the production form of
    :func:`knn_join_ivf` — identical results for the same centroids
    and probe count (pytest-gated in test_ann_index.py)."""
    import json
    import os

    from .lineage import truncate_lineage

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)
    # r14: probe assignment via the numpy kernel (bit-exact probe sets,
    # pytest-asserted vs ivf_probe_cells), materialized once — it feeds
    # both the probed-cell listing and the scoring cogroup below.
    lv = truncate_lineage(
        ivf_probe_cells_np(
            left.select(
                F.col(left_id), F.col(vec_col).cast("array<double>").alias("__lv")
            ),
            "__lv",
            centroids,
            n_probe,
        )
    )
    # r14: STATIC partition pruning + cogrouped scoring, replacing the
    # cell equi-join + per-candidate Arrow dot. The join form relied on
    # runtime DPP to skip unprobed cell directories, but its scoring
    # shipped BOTH vectors across the Python boundary on every
    # candidate row (probes × occupancy — ~1 KB × |left|·occ·n_probe).
    # The probed-cell set is bounded by the index's cell count (≤ the
    # 4096 cap), so collecting it is a bounded driver materialization,
    # and a literal IN filter prunes the same partitions at PLANNING
    # time (PartitionFilters on the scan — stronger than DPP, no
    # runtime subquery). Scoring then cogroups on the cell key: every
    # vector crosses the Arrow boundary ONCE per cell (nl + nr rows,
    # not nl × nr — guide §8 "move heavy bytes once"), through the
    # kernel that replicates the expression fold bit-for-bit.
    cells = sorted(
        r["__cell"] for r in lv.select("__cell").distinct().collect()
    )
    idx = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin([int(c) for c in cells]))
        .select(
            F.col(right_id),
            F.col(vec_col).cast("array<double>").alias("__rv"),
            F.col("cell").cast("int").alias("__cell"),
        )
    )
    return knn_join_cells_cogrouped(lv, idx, k, left_id, right_id)


def ivf_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Query a persisted IVF index: rank cells by centroid similarity
    driver-side (n_cells dot products), scan ONLY the probed cell
    partitions, exact-cosine rerank. The ``cell`` filter is a partition
    filter, so unprobed cells never leave the file listing."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)

    probe = sorted(
        range(len(centroids)), key=lambda i: (-_cos_py(query, centroids[i]), i)
    )[:n_probe]
    return (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probe))
        .select(F.col(id_col), cosine_col(F.col(vec_col), query).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _cosine_cols(v: Column, c: Column) -> Column:
    """Cosine between two array COLUMNS (cosine_col's constant-query
    fast path doesn't apply — here the 'query' varies per row, e.g.
    each row's own cell centroid)."""
    dot = F.aggregate(
        F.zip_with(v, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    nc = F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (nv * nc)


def ivf_index_health(spark, path: str, vec_col: str = "embedding") -> DataFrame:
    """Operational health of a persisted IVF index: per-cell occupancy
    and the mean cosine of each vector to its OWN cell centroid.

    This is the monitoring surface for incremental ingest
    (test_ann_index.py::test_ivf_ingest_soak_and_drift_trigger): the
    frozen centroids stay correct forever for RESULTS (probes rerank
    with exact cosine), but recall decays silently if the incoming
    distribution drifts away from the trained cells — rows land in
    far cells, and the true neighbors of a query stop being
    concentrated in its probed cells. A falling mean assigned cosine
    (index-wide, or per appended batch via :func:`ivf_batch_drift`)
    is the re-train trigger; occupancy skew is the partition-size
    alarm. One scan of the index, one n_cells-row aggregate."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)
    cents_lit = F.lit([[float(x) for x in c] for c in centroids])
    df = spark.read.parquet(path)
    own = F.element_at(cents_lit, F.col("cell").cast("int") + 1)
    return (
        df.groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            F.avg(
                _cosine_cols(F.col(vec_col).cast("array<double>"), own)
            ).alias("mean_cos"),
        )
        .orderBy("cell")
    )


def ivf_batch_drift(
    batch_df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> float:
    """Mean best-cell cosine of an INCOMING batch against the frozen
    centroids, BEFORE appending it — the cheap pre-ingest drift probe
    (one assignment projection + a 1-row aggregate; nothing persisted).
    Compare against the index's own mean (:func:`ivf_index_health`):
    a material drop means the batch's distribution is not the one the
    cells were trained on, so schedule a centroid re-train
    (``centroids="kmeans"`` rebuild) rather than letting partial-probe
    recall decay silently."""
    assigned = ivf_assign_cells(batch_df, vec_col, centroids)
    cents_lit = F.lit([[float(x) for x in c] for c in centroids])
    own = F.element_at(cents_lit, F.col("__cell").cast("int") + 1)
    row = assigned.agg(
        F.avg(
            _cosine_cols(F.col(vec_col).cast("array<double>"), own)
        ).alias("m")
    ).collect()[0]
    return float(row.m)


# --------------------------------------------------------------------------
# k-means (Lloyd's) over embedding columns
# --------------------------------------------------------------------------


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iters: int = 2,
    round_digits: int = 4,
    out_col: str = "cluster",
) -> DataFrame:
    """Lloyd's k-means cluster assignment, deterministic and
    cross-engine reproducible.

    - init: centroids are the ``k`` vectors with the smallest ids
      (seedless, rerun- and engine-stable — same discipline as
      :func:`_ivf_centroids`);
    - assignment: argmin squared-L2 against a literal centroid matrix,
      one codegen projection, ties to the lowest cluster id
      (``array_position`` returns the first minimum);
    - update: per-(cluster, dim) means via ``posexplode`` + partial
      aggregation — the shuffle carries only k·dim rows per map
      partition, the classic distributed-k-means reduce; the k·dim
      result is the ONLY driver materialization per iteration;
    - centroid coordinates are rounded to ``round_digits`` after every
      update, which pins the literal matrices bit-identically across
      engines/reruns so a differential oracle can replay the exact
      trajectory (FP noise in a mean is ~1e-13, far inside the grid).

    Returns the input frame + ``out_col`` (cluster id of the LAST
    assignment pass; ``n_iters`` assignment passes run in total, with
    ``n_iters - 1`` centroid updates between them). Empty clusters
    drop out of the trajectory naturally (no members → no updated
    centroid), matching the SQL formulation.

    At 100 TB: each iteration is one map-side projection + one
    bounded-key shuffle; the driver holds k·dim floats. This is the
    index-build step for semantic dedup (SemDeDup) and IVF — build
    once, persist the assignment partitioned by cluster.
    """
    v = F.col(vec_col).cast("array<double>")
    init = (
        df.select(F.col(id_col), v.alias("__v")).orderBy(id_col).limit(k).collect()
    )
    cents: list[list[float]] = [list(map(float, r["__v"])) for r in init]
    cluster_ids: list[int] = list(range(len(cents)))

    def _assigned(frame: DataFrame) -> DataFrame:
        # r14 (guide §4.2): numpy mapInPandas kernel in place of the
        # interpreted HOF projection, which evaluated the k·dim
        # distance array TWICE per row (array_position + array_min are
        # separate evaluations of the same transform(...) tree) with
        # per-element lambda dispatch — the "interpreted-HOF ×
        # scale-pinned-config" cost class. Bit-exact by construction:
        # the expression's aggregate(zip_with(v, c, (a-b)²), 0.0, +)
        # is a sequential left fold over dims, reproduced here as a
        # float64 cumsum over axis 2 (same op order, each op IEEE
        # double); np.argmin takes the FIRST minimum, exactly
        # array_position(d2, array_min(d2)); cluster ids map through
        # the same surviving-id list as element_at(ids_lit, pos).
        import numpy as np

        cn = np.array([[float(x) for x in c] for c in cents], np.float64)
        ids = np.array(cluster_ids, np.int64)
        dim = cn.shape[1]

        def kernel(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(
                    [np.asarray(x, np.float64) for x in pdf[vec_col]]
                )
                n = len(V)
                cl = np.empty(n, np.int64)
                step = max(1, (4 << 20) // max(1, len(cn) * dim))
                for s in range(0, n, step):
                    diff = V[s : s + step, None, :] - cn[None, :, :]
                    d2 = np.cumsum(diff * diff, axis=2)[:, :, -1]
                    cl[s : s + step] = ids[np.argmin(d2, axis=1)]
                out = pdf.copy()
                out[out_col] = cl
                yield out

        schema = (
            ",".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in frame.schema.fields
            )
            + f",`{out_col}` int"
        )
        return frame.mapInPandas(kernel, schema=schema)

    for it in range(n_iters - 1):
        upd = (
            # the update pass needs only (cluster, vec): pruning the
            # kernel's input to the vector column keeps every other
            # column off the Arrow boundary (guide §4.1)
            _assigned(df.select(F.col(vec_col)))
            .select(F.col(out_col), F.posexplode(v).alias("dim", "x"))
            .groupBy(out_col, "dim")
            .agg(F.round(F.avg("x"), round_digits).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cluster.setdefault(r[0], {})[r[1]] = r[2]
        cluster_ids = sorted(by_cluster)
        dim = len(cents[0])
        cents = [
            [by_cluster[c][d] for d in range(dim)] for c in cluster_ids
        ]
    return _assigned(df)


def _f64_order_key(x):
    """Monotone int64 key replicating java.lang.Double.compare ordering
    (including -0.0 < 0.0 and NaN greatest) so a numpy argmax picks the
    same element as Catalyst's array_position(arr, array_max(arr))."""
    import numpy as np

    b = np.ascontiguousarray(x, np.float64).view(np.int64)
    return np.where(b < 0, b ^ np.int64(0x7FFFFFFFFFFFFFFF), b)


def _ivfpq_build_frames_np(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    n_sub: int,
    n_codes: int,
    dim: int,
):
    """Numpy fast path of :func:`_ivfpq_build` for the PRODUCTION
    configuration (sample centroids, flat assignment, no replay
    rounding pins): normalize + cell-assign + residual + PQ-encode run
    as two ``mapInPandas`` kernels instead of interpreted HOF
    expression trees. ~1.2 s of per-call driver-side py4j expression
    construction disappears along with the per-element interpreted
    math; at scale the rows×cells assignment — the dominant index-build
    term — is vectorized (guide §4.2).

    BIT-EXACT with the expression path (pytest-asserted at sf0.001 and
    sf0.1): sequential-fold sums via cumsum, cell scores rounded with
    the HALF_UP/shortest-repr replication (npsig.round_half_up_np),
    argmax under the Double.compare total order (ties to the lowest
    cell/code), residual = unit vector minus the RAW collected
    centroid — each the same IEEE-754 ops in the same order as the
    expressions they replace.

    ONE corpus pass, ONE bounded collect (r14, guide §1.2/§4): the
    md5-ordered TakeOrdered that used to run twice (n_cells rows for
    centroids, then again through a full corpus assign pass for
    pq_train's 2048-row sample) now runs once for max(sample, n_cells)
    rows; the sample's residuals and the codebooks train driver-side
    with the same numpy ops the kernel applies (per-row math — chunking
    and batching cannot change any value), and assignment + PQ encode
    fuse into a single mapInPandas crossing, so the corpus crosses the
    Arrow boundary once instead of three times (assign for the train
    sample, assign again, then encode).
    """
    import math as _math

    import numpy as np

    # centroid pick + PQ train sample in ONE TakeOrdered job: the first
    # n_cells rows of the md5 order are the centroids (same rows the
    # separate limit(n_cells) collect returned), the first `sample`
    # rows are pq_train's sample (same rows its collect over the
    # assigned frame returned — the md5 order is on the id column,
    # which the assign kernel carries through unchanged).
    sample = PQ_TRAIN_SAMPLE
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(max(n_cells, sample))
        .collect()
    )

    def _unit(v):
        a = np.asarray(v, np.float64)
        return a / _math.sqrt(float(np.cumsum(a * a)[-1] + 0.0))

    cents = [[float(x) for x in _unit(r.v)] for r in rows[:n_cells]]

    def _normed(c):
        n = _math.sqrt(sum(x * x for x in c)) or 1.0
        return [x / n for x in c]

    cn = np.array([_normed(c) for c in cents], np.float64)  # (cells, dim)
    craw = np.array(cents, np.float64)

    def _assign(V):
        """normalize + cell-assign + residual for a (n, dim) matrix —
        the shared per-row math of the executor kernel and the
        driver-side training sample (row-independent, so identical
        wherever it runs)."""
        from ..functions.npsig import round_half_up_np

        nrm = np.sqrt(np.cumsum(V * V, axis=1)[:, -1:] + 0.0)
        VN = V / nrm
        # rows×cells sequential-fold dots, chunked to ~32 MB blocks
        n = len(VN)
        cell = np.empty(n, np.int32)
        step = max(1, (4 << 20) // max(1, len(cn) * dim))
        for s in range(0, n, step):
            dots = (
                np.cumsum(VN[s : s + step, None, :] * cn[None, :, :], axis=2)[
                    :, :, -1
                ]
                + 0.0
            )
            sims = round_half_up_np(dots, CELL_SCORE_DECIMALS)
            cell[s : s + step] = np.argmax(_f64_order_key(sims), axis=1)
        res = VN - craw[cell]
        return VN, cell, res

    # codebooks train driver-side on the sample rows' residuals — the
    # exact doubles the old corpus-pass collect returned (binary64
    # survives the Arrow/py4j round trip; the kernel math is per-row).
    Xs = np.stack([np.asarray(r.v, np.float64) for r in rows])
    _, _, res_s = _assign(Xs)
    books = _pq_train_np(res_s[:sample], dim, n_sub, n_codes)
    sub = dim // n_sub
    B = np.array(books, np.float64)  # (n_sub, n_codes, sub)
    # the -||c||²/2 fold seed, with the SAME driver-python sequential
    # sum pq_encode's norms_lit uses
    seeds = np.array(
        [
            [float(sum(x * x for x in code)) / 2.0 for code in books[s]]
            for s in range(n_sub)
        ],
        np.float64,
    )

    def kernel_assign_encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            VN, cell, res = _assign(V)
            codes = _pq_codes_np(res, B, seeds, n_sub, n_codes, sub)
            out = pdf.copy()
            out["__vn"] = list(VN)
            out["__cell"] = cell.astype(np.int32)
            out["__pq"] = list(codes)
            yield out

    schema = (
        ",".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        + ",`__vn` array<double>,`__cell` int,`__pq` array<int>"
    )
    encoded = df.mapInPandas(kernel_assign_encode, schema=schema)
    return encoded, cents, books


def _pq_codes_np(R, B, seeds, n_sub: int, n_codes: int, sub: int):
    """PQ-encode a (n, dim) residual matrix against codebook tensor B
    ((n_sub, n_codes, sub)) with fold seeds -||c||²/2 — the shared
    per-row math of :func:`pq_encode_frames_np` and the fused build
    kernel. Returns (n, n_sub) int32 codes."""
    import numpy as np

    n = len(R)
    codes = np.empty((n, n_sub), np.int32)
    for s in range(n_sub):
        Rs = R[:, s * sub : (s + 1) * sub]
        prods = Rs[:, None, :] * B[s][None, :, :]
        full = np.concatenate(
            [
                np.broadcast_to(-seeds[s], (n, n_codes))[:, :, None],
                prods,
            ],
            axis=2,
        )
        scores = np.cumsum(full, axis=2)[:, :, -1]
        codes[:, s] = np.argmax(_f64_order_key(scores), axis=1)
    return codes


def pq_encode_frames_np(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    code_col: str = "__pq",
    drop_vec: bool = False,
) -> DataFrame:
    """Numpy ``mapInPandas`` form of :func:`pq_encode` for the
    production (unrounded) configuration — bit-exact with the
    expression path (pytest-asserted): per subspace, score = the
    sequential fold seeded at -||c||²/2 (cumsum over a prepended seed
    column), argmax under the Double.compare total order (ties to the
    lowest code). Removes both the interpreted per-element scoring and
    the per-call driver-side construction of the codebook literal
    trees (guide §4.2)."""
    import numpy as np

    n_sub = len(codebooks)
    n_codes = len(codebooks[0])
    sub = len(codebooks[0][0])
    B = np.array(codebooks, np.float64)
    # the -||c||²/2 fold seed, with the SAME driver-python sequential
    # sum pq_encode's norms_lit uses
    seeds = np.array(
        [
            [float(sum(x * x for x in code)) / 2.0 for code in codebooks[s]]
            for s in range(n_sub)
        ],
        np.float64,
    )

    def kernel_encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            R = np.stack([np.asarray(v, np.float64) for v in pdf[vec_col]])
            codes = _pq_codes_np(R, B, seeds, n_sub, n_codes, sub)
            out = (pdf.drop(columns=[vec_col]) if drop_vec else pdf).copy()
            out[code_col] = list(codes)
            yield out

    schema = (
        ",".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if not (drop_vec and f.name == vec_col)
        )
        + f",`{code_col}` array<int>"
    )
    return df.mapInPandas(kernel_encode, schema=schema)


def _ivfpq_build(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int,
    n_sub: int,
    n_codes: int,
    dim: int,
    centroid_method: str = "sample",
    assign: str = "flat",
    pq_round_digits: int | None = None,
    score_digits: int | None = None,
    _force_exprs: bool = False,
):
    """Shared IVF-PQ build: L2-normalize, assign coarse cells, train
    residual codebooks, PQ-encode. Returns (encoded_df, centroids,
    codebooks); ``encoded_df`` keeps the original columns plus
    ``__vn`` (unit vector), ``__cell``, ``__pq``.
    ``centroid_method="kmeans"`` swaps the coarse-quantizer training
    for the distributed Lloyd refinement (see :func:`ivf_index_write`).

    Normalization matters: on unit vectors squared-L2 ADC ordering IS
    cosine ordering (||q̂−v̂||² = 2−2cos) — without it L2-ranked
    candidates drop cosine-top rows (measured recall 0.8 → 1.0 at
    full probe on the bench corpus).

    The production configuration (sample centroids, flat assignment, no
    replay rounding pins) routes through the bit-exact numpy kernels
    (:func:`_ivfpq_build_frames_np`); the pinned replay configs keep
    the expression path the oracle certificates were built against.
    ``_force_exprs`` is the test hook that pins the expression path so
    the equivalence suite can compare the two.
    """
    if (
        not _force_exprs
        and centroid_method == "sample"
        and assign == "flat"
        and pq_round_digits is None
        and score_digits is None
    ):
        return _ivfpq_build_frames_np(
            df, vec_col, id_col, n_cells, n_sub, n_codes, dim
        )
    v_raw = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(v_raw, F.lit(0.0), lambda acc, x: acc + x * x))
    df_n = df.withColumn("__vn", F.transform(v_raw, lambda x: x / nrm))
    centroids = _train_centroids(df_n, "__vn", id_col, n_cells, centroid_method)
    assigner = {"flat": ivf_assign_cells, "2level": ivf_assign_cells_2level}[assign]
    assigned = assigner(df_n, "__vn", centroids)
    cents_lit = F.lit([[float(x) for x in c] for c in centroids])
    r_df = assigned.withColumn(
        "__res",
        F.zip_with(
            F.col("__vn"),
            F.element_at(cents_lit, F.col("__cell") + 1),
            lambda a, b: a - b,
        ),
    )
    books = pq_train(
        r_df, "__res", id_col, dim=dim, n_sub=n_sub, n_codes=n_codes,
        round_digits=pq_round_digits,
    )
    encoded = pq_encode(
        r_df, "__res", books, score_digits=score_digits
    ).drop("__res")
    return encoded, centroids, books


def _ivfpq_scan(
    encoded: DataFrame,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    query: list[float],
    k: int,
    id_col: str,
    vec_col: str,
    n_probe: int,
    rerank: int,
    cell_col: str = "__cell",
    code_col: str = "__pq",
    score_digits: int | None = None,
) -> DataFrame:
    """Shared IVF-PQ probe: rank cells driver-side, ADC-score the
    probed cells against per-cell residual LUTs (one nested literal),
    exact-cosine rerank of the best ``rerank`` candidates.

    ``score_digits`` pins the ADC rerank cut to a fixed decimal grid
    (replay-certificate discipline, see :func:`pq_topk`); production
    default None."""
    import math as _math

    dim = len(query)
    n_sub = len(books)
    sub = dim // n_sub
    q_nrm = _math.sqrt(sum(x * x for x in query)) or 1.0
    qn = [x / q_nrm for x in query]

    probe = sorted(
        range(len(centroids)), key=lambda i: (-_cos_py(qn, centroids[i]), i)
    )[:n_probe]
    luts = []
    for c in probe:
        qr = [q - cc for q, cc in zip(qn, centroids[c])]
        lut_c = []
        for s in range(n_sub):
            qs = qr[s * sub : (s + 1) * sub]
            lut_c.append(
                [
                    float(sum((a - b) ** 2 for a, b in zip(qs, code)))
                    for code in books[s]
                ]
            )
        luts.append(lut_c)
    probe_lit = F.lit([int(c) for c in probe])
    luts_lit = F.lit(luts)
    cell_lut = F.element_at(
        luts_lit, F.array_position(probe_lit, F.col(cell_col)).cast("int")
    )
    approx = F.lit(0.0)
    for s in range(n_sub):
        approx = approx + F.element_at(
            F.element_at(cell_lut, s + 1),
            F.element_at(F.col(code_col), s + 1) + 1,
        )
    if score_digits is not None:
        approx = F.round(approx, score_digits)
    candidates = (
        encoded.filter(F.col(cell_col).isin([int(c) for c in probe]))
        .withColumn("__adc", approx)
        .orderBy(F.asc("__adc"), F.asc(id_col))
        .limit(rerank)
    )
    return (
        candidates.select(
            F.col(id_col), cosine_col(F.col(vec_col), query).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 4,
    n_codes: int = 16,
    rerank: int = 100,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN composition (coarse
    inverted file + residual product quantization), as one lazy plan.

    - coarse: vectors assign to ``n_cells`` centroid cells
      (:func:`ivf_assign_cells`); a query probes the ``n_probe``
      nearest cells — at scale the encoded column is persisted
      partitioned by cell (:func:`ivfpq_index_write`), so the probe
      is partition pruning;
    - residual PQ: codebooks train on ``v − centroid[cell]``
      (residuals are what PQ quantizes well — centered,
      low-variance), encoding is the usual literal-matrix codegen;
    - ADC per probed cell: the LUT depends on the cell (the query
      residual differs per cell), so the scan carries ``n_probe``
      LUTs as ONE nested literal indexed by the row's cell rank;
      approximate distance = Σ_s LUT[cell][s][code_s], then
      ``rerank`` best candidates pay the exact cosine.

    Everything after codebook training (bounded driver sample, see
    :func:`pq_train`) is whole-stage codegen; nothing corpus-sized is
    collected or shuffled.
    """
    encoded, centroids, books = _ivfpq_build(
        df, vec_col, id_col, n_cells, n_sub, n_codes, dim=len(query)
    )
    return _ivfpq_scan(
        encoded, centroids, books, query, k, id_col, vec_col, n_probe, rerank
    )


def ivfpq_index_write(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 8,
    n_sub: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    centroids: str = "sample",
    assign: str = "flat",
):
    """Build and persist the IVF-PQ index: PQ codes + unit vectors
    written parquet PARTITIONED BY cell, centroids and codebooks in
    ``_ivfpq_meta.json`` alongside (underscore-prefixed so Spark's
    reader skips it).

    Build-once/probe-many: the expensive parts (assignment pass,
    codebook training, encode) run once; every later query is a
    partition-pruned scan of ``n_probe`` cell directories scoring
    n_sub-byte codes. The vector column rides in the same row groups
    for the rerank — at extreme scale store it in a separate
    co-partitioned table and join the ``rerank`` candidates only.
    Returns (centroids, codebooks).
    """
    import json
    import os

    encoded, cents, books = _ivfpq_build(
        df, vec_col, id_col, n_cells, n_sub, n_codes, dim,
        centroid_method=centroids, assign=assign,
    )
    out = encoded.withColumnRenamed("__cell", "cell").withColumnRenamed(
        "__pq", "pq"
    )
    # r14: shuffle by cell before the partitioned write — same
    # M·cells file-explosion fix as ivf_index_write (guide §6);
    # measured 514→~cells files and −1.7 s on the build at sf0.1.
    out.repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)
    with open(os.path.join(path, "_ivfpq_meta.json"), "w") as f:
        json.dump({"centroids": cents, "codebooks": books}, f)
    return cents, books


def ivfpq_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    rerank: int = 100,
) -> DataFrame:
    """Query a persisted IVF-PQ index: cells ranked driver-side from
    the stored centroids, ONLY the probed cell partitions scanned
    (partition filter — unprobed cells never leave the file listing),
    ADC over stored codes, exact rerank over the stored vectors."""
    import json
    import os

    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    encoded = spark.read.parquet(path)
    return _ivfpq_scan(
        encoded,
        meta["centroids"],
        meta["codebooks"],
        query,
        k,
        id_col,
        vec_col,
        n_probe,
        rerank,
        cell_col="cell",
        code_col="pq",
    )
