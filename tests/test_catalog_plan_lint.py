"""Catalog-wide physical-plan lint: every entry in the driver catalog
is built (not executed) and its formatted plan is screened for the
anti-patterns that kill a 100 TB scale-up, with explicit whitelists
for the entries whose semantics genuinely require the pattern.

This is the breadth counterpart of test_plan_quality.py's depth gates:
a new catalog entry with a row-at-a-time Python UDF, an accidental
cartesian product, or a whole-table single-partition stage fails CI
here even if its sf0.01 oracle row is green.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

# Entries whose construction itself runs Spark jobs (bounded: offset
# collects, codebook/merge training, recall joins). They still get
# linted — building them is just slower. Documentation-only (no
# assertion reads this set); keep it current so a slow lint build has
# a named explanation.
_RUNS_JOBS = {
    "x_sorted_neighborhood",  # global_rank: eager checkpoint + offsets collect
    "w_rank",
    "w_rank_multi",
    "w_dense_rank",
    "sim_ann_pq",
    "sim_ann_recall_cert",
    "txt_bpe_tokens",
    "txt_bpe_roundtrip",
    "dd_clusters",
    "dd_clusters_verified",
    "dd_incremental",
    "x_dataset_mix",
    "x_global_shuffle",
    "pipe_curation",
    "x_negative_pairs",
}

# CROSS JOIN is these entries' declared semantics (reference grammar
# J5-J7 / comma-FROM) or a documented bounded-side pattern.
_CARTESIAN_OK = {
    "j_cross",
    "j_comma_implicit",
    "j_self_alias",
    # brute-force kNN join is all-pairs BY DESIGN with the small side
    # broadcast (BroadcastNestedLoopJoin); the large-large path takes
    # explicit block columns instead (similarity.py::knn_join_bruteforce)
    "sim_knn_join",
    # relevance family: crossJoin(broadcast(<1-row aggregate>)) attaches
    # corpus scalars (N docs, avgdl, token totals) — a BroadcastNestedLoop
    # over exactly one broadcast row, the lazy alternative to collecting
    # the scalar to the driver (operators/relevance.py module docstring)
    "txt_tfidf",
    "txt_bm25",
    "txt_pmi",
    "txt_lm_score",
    # kNN graph build is a broadcast all-pairs join at catalog scale
    # (at 100 TB the edge list comes from the IVF/LSH candidate
    # pipeline); the rank iteration itself attaches 1-row scalars via
    # broadcast cross join (operators/graph.py::pagerank docstring)
    "x_pagerank",
    # funnel counts are four 1-row aggregates cross-joined into one
    # constant-width row — the lazy alternative to collecting counts
    "pipe_dedup_funnel",
    # the quantile list (|qs| rows, here 2) attaches to the bounded
    # counter table via broadcast cross join (sketches.py::
    # hist_quantile_rollup) — sketch-sized on both sides
    "a_hist_quantile_rollup",
    # two-pass ntile attaches the 1-row corpus count via broadcast
    # cross join (the price of removing the SinglePartition window)
    "x_quality_buckets",
    # negative sampling attaches the 1-row corpus count the same way
    # before the md5-mod-N position draw
    "x_negative_pairs",
}

# BatchEvalPython = row-at-a-time Python UDF — never acceptable in this
# repo (Arrow-batched ArrowEvalPython / MapInPandas are the sanctioned
# Python boundaries).
_ROW_PYTHON_OK: set[str] = set()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def plans(spark):
    out: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        try:
            out[name] = _formatted(fn(spark, SF_DIR))
        except Exception as e:  # surface build breakage as lint failure
            out[name] = f"__BUILD_ERROR__ {type(e).__name__}: {e}"
    return out


def test_all_entries_build(plans):
    broken = {n: p for n, p in plans.items() if p.startswith("__BUILD_ERROR__")}
    assert not broken, f"{len(broken)} entries failed to build: {broken}"


def test_no_row_at_a_time_python(plans):
    bad = [
        n
        for n, p in plans.items()
        if "BatchEvalPython" in p and n not in _ROW_PYTHON_OK
    ]
    assert not bad, (
        f"row-at-a-time Python UDF (BatchEvalPython) in: {bad} — use "
        "built-in expressions or Arrow-batched pandas UDFs"
    )


def test_no_unexpected_cartesian(plans):
    bad = [
        n
        for n, p in plans.items()
        if ("CartesianProduct" in p or "BroadcastNestedLoopJoin" in p)
        and n not in _CARTESIAN_OK
    ]
    assert not bad, f"cartesian/nested-loop join outside whitelist: {bad}"


def test_single_partition_only_moves_aggregates(plans):
    # Exchange SinglePartition is fine when it moves (partial-)aggregate
    # or limit output — tiny rows. It is a scale bug when it moves scan
    # output (the pre-round-3 global-rank shape). Heuristic: some
    # aggregate/limit/window-over-aggregate marker must appear earlier
    # in the formatted plan text than the exchange.
    bad = []
    for n, p in plans.items():
        for m in re.finditer(r"Exchange SinglePartition", p):
            prefix = p[: m.start()]
            if not any(
                k in prefix
                for k in ("HashAggregate", "SortAggregate", "CollectLimit",
                          "TakeOrderedAndProject", "ObjectHashAggregate")
            ):
                bad.append(n)
                break
    assert not bad, f"SinglePartition exchange moving non-aggregate data: {bad}"
