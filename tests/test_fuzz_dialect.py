"""Property-based differential fuzzing of the SQL surface: hypothesis
generates random expression trees in the ANSI-common subset (valid in
both dialects untouched), each query runs through the engine's full
path (dialect shim → Catalyst) AND DuckDB over the same parquet table,
and the result multisets must match bit-for-bit.

Why this exists: the hand-written catalog pins ~165 known shapes; the
fuzzer walks the combinatorial space BETWEEN them (nested arithmetic,
CASE inside predicates, three-way logic with NOT/NULL-safe spots,
grouped aggregates over generated keys) where shim or type-coercion
bugs would hide. Expressions are restricted to operations with
deterministic bit-identical semantics in both engines: +, -, * over
doubles (same IEEE ops, same order), integer literals, comparisons,
AND/OR/NOT, CASE WHEN, least/greatest/abs, and aggregates whose values
are exact in binary floating point (count, min, max, sum of the
integral-valued l_quantity). Division, avg, and non-integral sums are
excluded — they reorder or round differently by design.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
STR_VALS = ["A", "N", "R", "O", "F"]


# --- expression grammar ----------------------------------------------------

def _num(depth: int) -> st.SearchStrategy[str]:
    leaf = st.one_of(
        st.sampled_from(NUM_COLS),
        st.integers(min_value=0, max_value=99).map(str),
    )
    if depth <= 0:
        return leaf
    sub = _num(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"least({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"greatest({t[0]}, {t[1]})"),
        sub.map(lambda e: f"abs({e})"),
        st.tuples(_pred(depth - 1), sub, sub).map(
            lambda t: f"(case when {t[0]} then {t[1]} else {t[2]} end)"
        ),
    )


def _pred(depth: int) -> st.SearchStrategy[str]:
    base = st.one_of(
        st.tuples(
            st.sampled_from(NUM_COLS),
            st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]),
            st.integers(min_value=0, max_value=60).map(str),
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
        st.tuples(st.sampled_from(STR_COLS), st.sampled_from(STR_VALS)).map(
            lambda t: f"({t[0]} = '{t[1]}')"
        ),
    )
    if depth <= 0:
        return base
    sub = _pred(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["and", "or"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda p: f"(not {p})"),
    )


projection_q = st.lists(_num(2), min_size=1, max_size=3).flatmap(
    lambda es: _pred(2).map(
        lambda p: "select "
        + ", ".join(f"{e} as c{i}" for i, e in enumerate(es))
        + f" from lineitem where {p}"
    )
)

grouped_q = st.tuples(st.sampled_from(STR_COLS), _pred(1)).map(
    lambda t: f"select {t[0]} as k, count(*) as n, "
    "cast(sum(l_quantity) as double) as s, "
    "min(l_extendedprice) as mn, max(l_extendedprice) as mx "
    f"from lineitem where {t[1]} group by {t[0]}"
)

# Equi-join + grouped exact aggregates: the join fan-out and the
# post-join predicate run through both engines; counts/integral sums
# keep the compare bit-exact.
join_q = st.tuples(_pred(2), st.sampled_from(["join", "left join"])).map(
    lambda t: "select o_orderpriority as k, count(l_quantity) as n, "
    "cast(sum(l_quantity) as double) as s "
    f"from orders {t[1]} lineitem on l_orderkey = o_orderkey "
    f"and {t[0]} group by o_orderpriority"
)

# Set operations over integral projections of the same table under two
# generated predicates — ANSI UNION/INTERSECT/EXCEPT semantics must
# agree (the reference's EXCEPT divergence is documented; the engine
# follows ANSI, same as DuckDB).
setop_q = st.tuples(
    _pred(1),
    _pred(1),
    st.sampled_from(["union", "union all", "intersect", "except"]),
).map(
    lambda t: "select cast(l_orderkey as bigint) as a, "
    f"cast(l_quantity as bigint) as b from lineitem where {t[0]} "
    f"{t[2]} select cast(l_orderkey as bigint), "
    f"cast(l_quantity as bigint) from lineitem where {t[1]}"
)

# Window ranks over a generated sort expression with a unique key
# tiebreak (l_orderkey, l_linenumber) — rank/dense_rank are then
# deterministic in both engines even when the expression ties.
window_q = st.tuples(
    st.sampled_from(["rank()", "dense_rank()"]),
    st.sampled_from(STR_COLS),
    _num(1),
    _pred(1),
).map(
    lambda t: f"select l_orderkey, l_linenumber, {t[0]} over "
    f"(partition by {t[1]} order by {t[2]}, l_orderkey, l_linenumber) as r "
    f"from lineitem where {t[3]}"
)


# --- differential harness --------------------------------------------------

def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return "<nan>" if math.isnan(v) else repr(v)
    if isinstance(v, int):
        return repr(float(v))  # count() is int64 on one side, compare as value
    return str(v)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _check(engine, duck, sql: str) -> None:
    spark_rows = engine.query(sql).collect()
    duck_rows = duck.execute(sql).fetchall()
    ms = Counter(tuple(_norm(v) for v in r) for r in spark_rows)
    md = Counter(tuple(_norm(v) for v in r) for r in duck_rows)
    assert ms == md, f"divergence on: {sql}\nonly-spark: {list((ms - md).items())[:3]}\nonly-duck: {list((md - ms).items())[:3]}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=projection_q)
def test_fuzz_projection_filter(engine, duck, sql):
    _check(engine, duck, sql)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=grouped_q)
def test_fuzz_grouped_aggregates(engine, duck, sql):
    _check(engine, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=join_q)
def test_fuzz_joins(engine, duck, sql):
    _check(engine, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=setop_q)
def test_fuzz_set_operations(engine, duck, sql):
    _check(engine, duck, sql)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=window_q)
def test_fuzz_window_ranks(engine, duck, sql):
    _check(engine, duck, sql)


# String-function expressions: compositions of upper/lower/trim/
# reverse/substr/replace/||/lpad that are byte-identical in both
# engines on ASCII inputs (the string columns are single ASCII chars;
# concat via || keeps ANSI NULL semantics — irrelevant here, the
# columns are non-null, but it keeps the subset portable).
def _strexpr(depth: int) -> st.SearchStrategy[str]:
    leaf = st.one_of(
        st.sampled_from(STR_COLS),
        st.sampled_from(STR_VALS).map(lambda v: f"'{v}'"),
    )
    if depth <= 0:
        return leaf
    sub = _strexpr(depth - 1)
    return st.one_of(
        leaf,
        sub.map(lambda e: f"upper({e})"),
        sub.map(lambda e: f"lower({e})"),
        sub.map(lambda e: f"trim({e})"),
        sub.map(lambda e: f"reverse({e})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} || {t[1]})"),
        st.tuples(
            sub,
            st.integers(min_value=1, max_value=3).map(str),
            st.integers(min_value=0, max_value=4).map(str),
        ).map(lambda t: f"substr({t[0]}, {t[1]}, {t[2]})"),
        st.tuples(sub, st.sampled_from(STR_VALS)).map(
            lambda t: f"replace({t[0]}, '{t[1]}', '_')"
        ),
        st.tuples(sub, st.integers(min_value=1, max_value=6).map(str)).map(
            lambda t: f"lpad({t[0]}, {t[1]}, '.')"
        ),
    )


string_q = st.lists(_strexpr(2), min_size=1, max_size=3).flatmap(
    lambda es: _pred(1).map(
        lambda p: "select "
        + ", ".join(f"{e} as s{i}, length({e}) as n{i}" for i, e in enumerate(es))
        + f" from lineitem where {p}"
    )
)


# IN lists / BETWEEN / NOT IN over integral and string domains — the
# membership-predicate surface (P11–P12) under composition.
inlist_q = st.tuples(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=5),
    st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=20, max_value=60),
    st.sampled_from(["in", "not in"]),
).map(
    lambda t: "select cast(l_orderkey as bigint) as k, "
    "cast(l_quantity as bigint) as q from lineitem "
    f"where (l_quantity {t[4]} ({', '.join(map(str, t[0]))}) "
    f"or l_returnflag in ({', '.join(repr(v) for v in t[1])})) "
    f"and l_quantity between {t[2]} and {t[3]}"
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=string_q)
def test_fuzz_string_functions(engine, duck, sql):
    _check(engine, duck, sql)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=inlist_q)
def test_fuzz_in_between(engine, duck, sql):
    _check(engine, duck, sql)
