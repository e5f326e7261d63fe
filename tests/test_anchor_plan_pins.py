"""Per-entry plan-shape pins for the 8 rotation anchors (SCALE.md
round-9 frontier item 3, delivered round 10).

The anchors are the only catalog entries scored EVERY round, so they
are where a silent plan regression (a lost pushdown, a join that stops
broadcasting, a window that collapses to SinglePartition) would do the
most damage while staying invisible to correctness gates. Each test
pins the positive plan properties the entry was designed around — not
just "no anti-pattern" (the catalog-wide lint already proves no
cartesian / no BNLJ / no row-Python across all 236 entries) but "the
shape that makes it scale is still there".

Pins are asserted at the tests' sf0.001 fixture; every pinned property
is SF-invariant by construction (pushdown, partial aggregation, top-k
operator choice, window partitioning, hash-based joins) — broadcast
presence is only pinned where the broadcast side is bounded by design
(dimension tables, centroid lists), never where it merely reflects
small test data.
"""

from __future__ import annotations

import re

import pytest

from dataframe_sql_spark.registry import spark_queries

SF_DIR = "/root/testdata/sf0.001"

ANCHORS = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_revenue",
    "dd_exact",
    "dd_minhash_verified",
    "sim_knn_join",
    "pipe_curation",
    "w_rank",
]


@pytest.fixture(scope="module")
def plans(spark):
    qs = spark_queries()
    out = {}
    for name in ANCHORS:
        df = qs[name](spark, SF_DIR)
        # "simple" mode inlines operator arguments (e.g. `Exchange
        # hashpartitioning(doc_hash#12, 32)`), which the key-level
        # assertions below need; "formatted" hoists them into a
        # separate Arguments section
        out[name] = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
    return out


def _exchange_keys(plan: str) -> list[str]:
    return re.findall(r"Exchange hashpartitioning\(([^)]*)", plan)


def test_anchors_free_of_scale_antipatterns(plans):
    # belt-and-braces duplicate of the catalog lint, scoped to the
    # always-scored entries so a lint whitelist edit can't exempt them
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name  # row-at-a-time Python


def test_q1_scan_agg_shape(plans):
    plan = plans["tpch_q1_pricing"]
    # the shipdate filter must reach the parquet scan, not run post-scan
    assert "LessThanOrEqual(l_shipdate" in plan, plan
    # map-side combine: more HashAggregate nodes than exchanges feeding
    # them means partial+final, the shape that caps shuffle volume by
    # group-count instead of row-count
    assert plan.count("HashAggregate") >= 2, plan
    assert "SortMergeJoin" not in plan  # scan+agg, no join should appear


def test_q3_topk_and_pushdowns(plans):
    plan = plans["tpch_q3_shipping"]
    # ORDER BY revenue LIMIT must be top-k, never a global sort
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    # selective dimension predicates reach their scans
    assert "EqualTo(c_mktsegment,BUILDING)" in plan, plan
    assert "GreaterThan(l_shipdate" in plan, plan
    assert "LessThan(o_orderdate" in plan, plan
    # joins stay hash-based
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert plan.count("HashAggregate") >= 2, plan


def test_q5_join_chain_shape(plans):
    plan = plans["tpch_q5_revenue"]
    # bounded dims (region/nation) must broadcast — that is a design
    # property (dimension tables stay small at any fact scale), not a
    # small-test-data artifact
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_dd_exact_groups_on_hash_not_text(plans):
    plan = plans["dd_exact"]
    assert plan.count("HashAggregate") >= 2, plan
    for keys in _exchange_keys(plan):
        assert "text#" not in keys, (
            "dedup exchange partitions on raw text — must key on the "
            f"fixed-width hash: {keys}"
        )


def test_minhash_exchanges_are_fixed_width(plans):
    plan = plans["dd_minhash_verified"]
    # signature build is a collect-based aggregate
    assert "ObjectHashAggregate" in plan, plan
    # candidate generation must exchange band/bucket keys, never the
    # raw document text (the 100-TB shuffle-volume rule; simhash's
    # zero-spill-at-100x result in SCALE.md is this property at work)
    for keys in _exchange_keys(plan):
        assert "text#" not in keys, keys


def test_knn_join_is_cell_partitioned_window(plans):
    plan = plans["sim_knn_join"]
    # per-cell top-k via window — partitioned, never a global sort of
    # all candidate pairs
    assert "Window" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_curation_pipeline_shape(plans):
    plan = plans["pipe_curation"]
    assert plan.count("HashAggregate") >= 2, plan
    for keys in _exchange_keys(plan):
        assert "text#" not in keys, keys


def test_w_rank_no_single_partition_window(plans):
    plan = plans["w_rank"]
    # the two-pass range-partitioned global rank (operators/rank.py):
    # a regression to Spark's default global-ORDER window would show
    # up as an Exchange SinglePartition feeding the Window
    assert "Window" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "Exchange hashpartitioning" in plan or (
        "Exchange rangepartitioning" in plan
    ), plan


# ---------------------------------------------------------------------------
# Top-bench-key pins (round-10 frontier item 5): the ops where a plan
# regression costs the most wall time. Same philosophy as the anchor
# pins — positive shapes, SF-invariant by construction — plus pins on
# the round-10 merge-hint fixes (a silently dropped hint would revert
# an op to the estimator-blind broadcast class).
# ---------------------------------------------------------------------------

BENCH_KEYS = [
    "dd_simhash_probed",
    "dd_minhash_pairs",
    "sim_knn_join_probed",
    "x_dsir_weights",
]


@pytest.fixture(scope="module")
def bench_plans(spark):
    qs = spark_queries()
    out = {}
    for name in BENCH_KEYS:
        df = qs[name](spark, SF_DIR)
        out[name] = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
    return out


def test_simhash_probe_join_stays_sort_merge(bench_plans):
    # probe↔exact candidate join: both sides post-explode (count AND
    # width blind to the estimator) — must never broadcast
    plan = bench_plans["dd_simhash_probed"]
    assert "SortMergeJoin" in plan, plan


def test_minhash_verify_joins_stay_sort_merge(bench_plans):
    # the two shingle-set verification joins carry corpus-scaled array
    # sides (width-blind) — merge-hinted in round 10
    plan = bench_plans["dd_minhash_pairs"]
    assert plan.count("SortMergeJoin") >= 2, plan


def test_knn_probed_cell_join_stays_sort_merge(bench_plans):
    # the cell-key equi-join's index side carries embedding arrays —
    # merge-hinted; per-left top-k stays a partitioned window
    plan = bench_plans["sim_knn_join_probed"]
    assert "SortMergeJoin" in plan, plan
    assert "Window" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_dsir_single_bucket_shuffle_shape(bench_plans):
    # design contract: ONE B-bounded bucket groupBy + the final
    # doc-keyed sum; score/total tables attach via broadcast — so the
    # plan carries few hash exchanges and at least one broadcast join,
    # and nothing exchanges on raw text (global lint) or runs
    # row-at-a-time Python
    plan = bench_plans["x_dsir_weights"]
    assert plan.count("Exchange hashpartitioning") <= 4, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan
