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
    # round 4: IVF centroid pick (bounded n_cells·dim collect) runs at
    # plan-build time for the cell-keyed kNN join family
    "sim_knn_join",
    "sim_knn_join_probed",
    "sim_ann_ivf_probed",
    "x_pagerank",
}

# CROSS JOIN is these entries' DECLARED SEMANTICS (reference grammar
# J5-J7 / comma-FROM) — nothing else in the catalog is allowed to plan
# a BroadcastNestedLoopJoin or CartesianProduct. The former whitelist
# of benign 1-row scalar attachments (relevance family, pagerank
# iteration, funnel counts, quantile lists, ntile/negative-sampling
# corpus counts) is gone: those now go through
# operators/scalars.py::broadcast_attach, which plans the same
# broadcast as a constant-key BroadcastHashJoin, and the two formerly
# all-pairs entries (sim_knn_join, x_pagerank's edge build) now run
# the IVF cell-keyed equi-join (similarity.py::knn_join_ivf). A BNLJ
# anywhere outside the three grammar entries is therefore an actual
# accidental cartesian product.
_CARTESIAN_OK = {
    "j_cross",
    "j_comma_implicit",
    "j_self_alias",
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
