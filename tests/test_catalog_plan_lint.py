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
    "sim_ann_pq_verified",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_verified",  # round 9: composed-cert build trains at plan time
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
def _built(spark):
    fmt: dict[str, str] = {}
    tree: dict[str, str] = {}
    schemas: dict[str, object] = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            fmt[name] = _formatted(df)
            tree[name] = df._jdf.queryExecution().executedPlan().toString()
            schemas[name] = df.schema
        except Exception as e:  # surface build breakage as lint failure
            fmt[name] = f"__BUILD_ERROR__ {type(e).__name__}: {e}"
            tree[name] = fmt[name]
    return fmt, tree, schemas


@pytest.fixture(scope="module")
def plans(_built):
    return _built[0]


@pytest.fixture(scope="module")
def trees(_built):
    return _built[1]


@pytest.fixture(scope="module")
def schemas(_built):
    return _built[2]


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


def test_single_partition_only_moves_aggregates(trees):
    # Exchange SinglePartition is fine when its IMMEDIATE input is an
    # aggregate: a global partial+final aggregate's final exchange
    # carries one row per upstream partition (bounded by partition
    # count, never data volume), and a keyed aggregate feeding a tiny
    # global step (x_global_shuffle's 4096-row bucket-offset sum) is
    # one row per key. It is a scale bug when the exchange moves scan/
    # join/window output — the pre-round-3 global-rank shape, where the
    # whole table lands on one task. The round-6 census of all 229
    # entries found exactly the aggregate-fed kind (29 entries, every
    # occurrence partial_*-fed); this pins that census as a gate.
    op_re = re.compile(r"(?:\+- |^)(\*?\(\d+\) )?([A-Za-z]+)")
    # row-preserving wrappers between the exchange and the aggregate
    # keep the volume bound intact; walk through them.
    passthrough = {"Project", "Filter", "Sort", "WholeStageCodegen"}
    bad = []
    for n, p in trees.items():
        lines = p.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            verdict = None
            for x in lines[i + 1 : i + 12]:
                body = x.strip().strip(":+- ")
                if not body:  # tree-structure-only line
                    continue
                m = op_re.search(x.replace(":", " "))
                op = m.group(2) if m else body.split("(")[0]
                if op in passthrough:
                    continue
                verdict = op
                break
            if verdict not in ("HashAggregate", "ObjectHashAggregate",
                               "SortAggregate"):
                bad.append((n, verdict, line.strip()[:60]))
                break  # one finding per entry is enough
    assert not bad, (
        f"SinglePartition exchange whose input is not an aggregate: {bad}"
    )


def test_no_composite_output_columns(schemas):
    # The DRIVER's correctness gate canonicalizes results by sorting
    # raw pandas columns before hashing; an ArrayType/MapType output
    # column materializes as numpy.ndarray / dict cells, which pandas
    # sort_values cannot factorize (TypeError: unhashable type) — the
    # CORRECTNESS_r08 `f_array_setops` failure. tools/check_oracle.py
    # tuple-normalizes cells for its value compare, so this lint (plus
    # check_oracle's always-on driver_canon_error replay of the raw
    # sort) is what catches the class locally. Any entry exporting an
    # oracle must serialize composite values (array_join / to_json /
    # explode) before returning them.
    from pyspark.sql.types import ArrayType, MapType

    oracled = set(entrymod.oracle_sql())
    bad = [
        (n, f.name, f.dataType.simpleString())
        for n, schema in schemas.items()
        if n in oracled
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"oracled entries with top-level array/map output columns {bad} — "
        "the driver's pandas canonicalizer crashes on these; serialize "
        "(array_join/to_json) or explode before returning"
    )


# Entries allowed to hash-exchange on the raw `text` column. Keep this
# empty: a shuffle keyed on full document text moves the whole corpus
# as keys (the 100-TB shuffle-volume rule is "exchange fixed-width
# hashes/signatures, never raw text" — see SCALE.md dedup section and
# the round-10 memory-pressure ledger where exactly this property is
# what lets simhash run 100x under a 2 GiB heap with zero spill).
# Anything that needs text-equality semantics must key on
# xxhash64/md5(text) instead.
_TEXT_EXCHANGE_OK: set[str] = set()


def test_no_exchange_keyed_on_raw_text(trees):
    bad = []
    for n, p in trees.items():
        if n in _TEXT_EXCHANGE_OK:
            continue
        for line in p.splitlines():
            if "hashpartitioning(" not in line:
                continue
            keys = line.split("hashpartitioning(", 1)[1]
            if re.search(r"(?<![\w.])text#\d+", keys.split(")")[0] + ")"):
                bad.append((n, line.strip()[:90]))
                break
    assert not bad, (
        f"exchange keyed on raw document text (shuffle volume scales "
        f"with corpus bytes, not row count): {bad}"
    )
