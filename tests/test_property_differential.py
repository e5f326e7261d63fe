"""Property-based differential testing: hypothesis generates random
queries from a small SELECT grammar; each runs through the Spark
engine AND DuckDB on the same parquet, and the result sets must match.

This generalizes the hand-written catalog oracles (and the reference's
hand-written pandas oracles, SURVEY §5) from "these N queries agree"
to "every query in this grammar agrees" — the cheapest way to catch
dialect-shim or null/float-semantics divergence on shapes nobody
thought to write down.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_DIR

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
STR_VALS = {
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
}
AGG_FNS = ["count", "sum", "min", "max"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


# ---- query grammar -------------------------------------------------------

num_predicate = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(NUM_COLS),
    st.sampled_from(["<", "<=", ">", ">=", "=", "!="]),
    st.one_of(st.integers(0, 2000), st.floats(0, 300000, allow_nan=False).map(lambda f: round(f, 2))),
)
str_predicate = st.builds(
    lambda c, v, neg: f"{c} {'!=' if neg else '='} '{v}'",
    st.sampled_from(STR_COLS),
    st.sampled_from(STR_VALS["o_orderstatus"] + STR_VALS["o_orderpriority"]),
    st.booleans(),
).filter(lambda p: True)
between_predicate = st.builds(
    lambda c, a, b: f"{c} BETWEEN {min(a, b)} AND {max(a, b)}",
    st.sampled_from(NUM_COLS),
    st.integers(0, 300000),
    st.integers(0, 300000),
)
in_predicate = st.builds(
    lambda c, vs, neg: f"{c} {'NOT IN' if neg else 'IN'} ({', '.join(repr(v) for v in sorted(vs))})",
    st.sampled_from(STR_COLS),
    st.sets(
        st.sampled_from(STR_VALS["o_orderstatus"] + STR_VALS["o_orderpriority"]),
        min_size=1,
        max_size=3,
    ),
    st.booleans(),
)


@st.composite
def where_clause(draw):
    n = draw(st.integers(1, 3))
    preds = [
        draw(st.one_of(num_predicate, str_predicate, between_predicate, in_predicate))
        for _ in range(n)
    ]
    out = preds[0]
    for p in preds[1:]:
        out = f"({out}) {draw(st.sampled_from(['AND', 'OR']))} ({p})"
    return out


@st.composite
def row_query(draw):
    cols = draw(st.permutations(NUM_COLS + STR_COLS).map(lambda c: list(c)[: draw(st.integers(1, 5))]))
    return f"SELECT {', '.join(cols)} FROM orders WHERE {draw(where_clause())}"


@st.composite
def agg_query(draw):
    key = draw(st.sampled_from(STR_COLS))
    fn = draw(st.sampled_from(AGG_FNS))
    col = draw(st.sampled_from(NUM_COLS))
    having = draw(st.booleans())
    q = (
        f"SELECT {key}, {fn}({col}) AS agg_v, count(*) AS n FROM orders "
        f"WHERE {draw(where_clause())} GROUP BY {key}"
    )
    if having:
        q += " HAVING count(*) > 1"
    return q


# ---- comparison ----------------------------------------------------------


def _normalize(pdf):
    pdf = pdf.copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(4)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_same(engine, ddb, sql):
    got = _normalize(engine.query(sql).toPandas())
    want = _normalize(ddb.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), sql
    assert len(got) == len(want), f"{sql}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind in "fi" and b.dtype.kind in "fi":
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=1e-9, atol=1e-6, equal_nan=True
            ), f"{sql}: column {c}"
        else:
            assert (a.astype(str) == b.astype(str)).all(), f"{sql}: column {c}"


# reference-dialect casts: (pandas type name for the engine, DuckDB
# rendering). Spark/pandas TRUNCATE float→int; DuckDB rounds — the
# oracle wraps in trunc() to pin the pandas semantics we follow.
CASTS = [
    ("o_totalprice", "int64", "trunc(o_totalprice)::BIGINT"),
    ("o_totalprice", "int32", "trunc(o_totalprice)::INT"),
    ("o_totalprice", "float64", "o_totalprice::DOUBLE"),
    ("o_orderkey", "float64", "o_orderkey::DOUBLE"),
    ("o_orderkey", "object", "o_orderkey::VARCHAR"),
    ("o_orderkey", "smallint", "trunc(o_orderkey)::SMALLINT"),
]


@st.composite
def ref_cast_query(draw):
    col, ref_t, duck_e = draw(st.sampled_from(CASTS))
    where = draw(where_clause())
    ref = f"select cast({col} as {ref_t}) as c0, o_orderkey from orders where {where}"
    duck = f"SELECT {duck_e} AS c0, o_orderkey FROM orders WHERE {where}"
    return ref, duck


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=row_query())
def test_random_projection_filter_matches_duckdb(engine, ddb, sql):
    _assert_same(engine, ddb, sql)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(pair=ref_cast_query())
def test_random_reference_dialect_cast_matches_duckdb(engine, ddb, pair):
    ref_sql, duck_sql = pair
    got = _normalize(engine.query(ref_sql).toPandas())
    want = _normalize(ddb.execute(duck_sql).fetchdf())
    assert len(got) == len(want), ref_sql
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind in "fi" and b.dtype.kind in "fi":
            assert np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-6), (
                ref_sql,
                c,
            )
        else:
            assert (a.astype(str) == b.astype(str)).all(), (ref_sql, c)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=agg_query())
def test_random_groupby_agg_matches_duckdb(engine, ddb, sql):
    _assert_same(engine, ddb, sql)


# ---- random outer joins --------------------------------------------------
# Join type × predicate placement is where engines classically diverge
# on NULL handling (a WHERE on the nullable side silently turns an
# outer join inner — both engines must agree on exactly which rows).

JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]


@st.composite
def join_query(draw):
    jt = draw(st.sampled_from(JOIN_TYPES))
    pred = draw(st.one_of(num_predicate, str_predicate, in_predicate))
    agg = draw(st.booleans())
    if agg:
        return (
            f"SELECT c_mktsegment, count(o_orderkey) AS n_ord, count(*) AS n "
            f"FROM customer {jt} orders ON c_custkey = o_custkey "
            f"WHERE ({pred}) OR o_orderkey IS NULL GROUP BY c_mktsegment"
        )
    return (
        f"SELECT c_custkey, c_mktsegment, o_orderkey, o_orderstatus "
        f"FROM customer {jt} orders ON c_custkey = o_custkey "
        f"WHERE ({pred}) OR c_custkey IS NULL"
    )


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=join_query())
def test_random_outer_join_matches_duckdb(engine, ddb, sql):
    _assert_same(engine, ddb, sql)
