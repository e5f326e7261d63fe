"""Query catalog: one entry per operator from SURVEY.md §2.

Each entry pairs
  - an *engine* query — reference-dialect SQL executed through
    :class:`SparkSqlEngine` (exercising the dialect shim + Catalyst),
    or a DataFrame-API callable for non-SQL operators — with
  - a DuckDB *oracle* — ANSI SQL over the same parquet tables —
and the driver hash-compares the two at sf0.01 (see __spark_entry__.py).

Determinism conventions (so value-hashes match across engines):
  - Non-integral double sums go through DECIMAL(18,2) then back to
    DOUBLE: exact arithmetic in both engines, identical bits out.
    (Integral-valued doubles like l_quantity sum exactly in binary
    floating point already.)
  - Averages are written sum/count with the same decimal trick.
  - Every ORDER BY ... LIMIT carries a unique-key tiebreak.
  - Column names are aliased identically on both sides.
  - Numeric literals in oracle SQL that feed double arithmetic are
    CAST(... AS DOUBLE): DuckDB parses `0.85` as DECIMAL and folds
    `1.0 - 0.85` exactly (→ the double nearest 0.15), while Spark
    subtracts doubles (0.15000000000000002) — one ulp apart, enough
    to flip a value sitting on a rounding boundary (bit us in
    x_pagerank at sf0.1).
  - Iterative trajectories (k-means, PageRank) pin each step: k-means
    rounds centroid coordinates; PageRank keeps ranks on a 6dp grid
    and sums contributions in exact INTEGER space (floor(rank·1e6+.5),
    int64 floor-div by degree) — never a bare double sum, whose
    accumulation order is engine-/partitioning-dependent.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .engine import SparkSqlEngine
from .session import tune_session

__all__ = ["QuerySpec", "CATALOG", "spark_queries", "oracle_sqls", "engine_for"]


@dataclass(frozen=True)
class QuerySpec:
    engine_sql: str | None = None  # reference-dialect SQL via SparkSqlEngine
    oracle: str | None = None  # DuckDB ANSI SQL (None → rows-only check)
    fn: Callable[[SparkSession, str], DataFrame] | None = None  # DataFrame-API impl
    doc: str = ""
    # Largest sf at which the ORACLE is feasible (None = any). Some
    # certificates are quadratic-by-design on the DuckDB side only
    # (complete pair sets, recursive closures) — the Spark side scales;
    # the oracle is the bounded part. tools/check_oracle.py reads this
    # and auto-skips (with the reason printed) instead of relying on a
    # hand-maintained --exclude list for beyond-driver-SF runs.
    oracle_max_sf: float | None = None
    # Why the entry stops at oracle_max_sf — printed verbatim in the
    # gate's SKIP line so the sweep output attributes the bound to the
    # right side. Most envelopes are oracle-side (the default message
    # covers them); a few are ENGINE-side (e.g. a replay certificate
    # whose pinned configuration is corpus-quadratic in the engine
    # pipeline itself) and a generic "oracle infeasible" line would
    # misreport a green sweep as having executed an entry that would
    # hang (r12 advisor note).
    max_sf_reason: str | None = None
    # The scale-safe production path for the bounded semantics — the
    # entry (or mechanism) a 100-TB user runs instead, and the gate
    # that covers it. Required whenever oracle_max_sf is set
    # (tools/envelope_ledger.py renders the table and the test suite
    # asserts completeness + non-staleness).
    scale_path: str | None = None


# --------------------------------------------------------------------------
# per-session view registration
# --------------------------------------------------------------------------

# Keyed on the session object itself (weakly): id() of a collected
# session can be reused by a new one, which would silently return an
# engine bound to a dead JVM. WeakKeyDictionary drops entries when the
# session is garbage-collected.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()
_ENGINES: "weakref.WeakKeyDictionary[SparkSession, SparkSqlEngine]" = (
    weakref.WeakKeyDictionary()
)


def engine_for(spark: SparkSession, sf_dir: str) -> SparkSqlEngine:
    """Engine bound to ``spark`` with the sf_dir tables registered.

    ``spark`` may be ANY session — in particular the driver's vanilla
    one, not the tuned ``session.get_spark()`` — so the runtime-settable
    confs the engine needs (nanosAsLong, UTC, case-insensitivity, AQE)
    are applied here, every call. Round 1 shipped without this and every
    driver query died reading events.parquet (TIMESTAMP_NANOS).
    """
    tune_session(spark)
    eng = _ENGINES.get(spark)
    if eng is None:
        eng = _ENGINES[spark] = SparkSqlEngine(spark)
    if _REGISTERED.get(spark) != sf_dir:
        eng.register_parquet_dir(sf_dir)
        _REGISTERED[spark] = sf_dir
    return eng


# --------------------------------------------------------------------------
# SQL snippet helpers (identical text is valid in both dialects)
# --------------------------------------------------------------------------


def dsum(col: str, alias: str) -> str:
    """Exact double sum via decimal: identical bits in Spark & DuckDB."""
    return f"cast(sum(cast({col} as decimal(18,2))) as double) as {alias}"


def davg(col: str, alias: str) -> str:
    return f"cast(sum(cast({col} as decimal(18,2))) as double) / count({col}) as {alias}"


# --------------------------------------------------------------------------
# catalog
# --------------------------------------------------------------------------

CATALOG: dict[str, QuerySpec] = {}


def _sql(name: str, engine_sql: str, oracle: str | None = None, doc: str = "") -> None:
    CATALOG[name] = QuerySpec(engine_sql=engine_sql, oracle=oracle or engine_sql, doc=doc)


# --- §2.2 projection / filter / scalar expressions ------------------------

_sql(
    "p_select_star",
    "select * from nation",
    doc="P1 select-star passthrough (ref tests :33-40)",
)
_sql(
    "p_project_alias",
    "select l_orderkey, l_linenumber, l_extendedprice as price, "
    "l_extendedprice as price2, l_quantity from lineitem",
    doc="P2/P3 projection, AS alias, multiple aliases of one column (:53-62, :1040-1058)",
)
_sql(
    "p_autonaming",
    "select avg(l_quantity), sum(l_quantity), count(*) from lineitem",
    oracle="SELECT avg(l_quantity) AS _col0, sum(l_quantity) AS _col1, count(*) AS _col2 "
    "FROM lineitem",
    doc="P4 unnamed expressions become _colN by position (:206-213, :262-279)",
)
_sql(
    "p_arith",
    "select l_orderkey, l_linenumber, "
    "l_quantity * l_extendedprice + l_tax / 2 - 1 as m, "
    "1 + 2 * 3 as lit, (l_quantity + 1) * 2 as paren from lineitem",
    doc="P5 arithmetic precedence + parentheses (:97-105, :418-431, :1114-1147)",
)
_sql(
    "p_string_literal",
    "select n_name, 'yes' as flag from nation",
    doc="P6 string literal column (:970-982)",
)
_sql(
    "p_cast",
    "select cast(l_quantity as int64) as q_int, cast(l_orderkey as object) as o_str, "
    "cast(l_linenumber as float64) as ln_f, cast(l_quantity as int16) as q_small, "
    "cast('1995-03-15' as datetime64) as d from lineitem",
    oracle="SELECT CAST(l_quantity AS BIGINT) AS q_int, CAST(l_orderkey AS VARCHAR) AS o_str, "
    "CAST(l_linenumber AS DOUBLE) AS ln_f, CAST(l_quantity AS SMALLINT) AS q_small, "
    "CAST('1995-03-15' AS TIMESTAMP) AS d FROM lineitem",
    doc="P7 pandas type vocabulary in CAST (:65-94, :1062-1111); D4 date literal cast (:985-997)",
)
_sql(
    "p_filter_predicates",
    "select l_orderkey, l_linenumber, l_quantity, l_discount from lineitem "
    "where (l_returnflag = 'R' and l_quantity > 30) "
    "or (l_discount <= 0.02 and l_tax != 0.0 and l_quantity >= 48) "
    "or l_quantity < 2",
    doc="P8-P10 comparison + boolean predicates with parens (:301-332, :1150-1167)",
)
_sql(
    "p_between_in",
    "select o_orderkey, o_totalprice from orders "
    "where o_totalprice between 1000 and 100000 "
    "and o_orderpriority in ('1-URGENT', '2-HIGH') "
    "and o_orderstatus not in ('X', 'Y')",
    doc="P11 BETWEEN (:641-656), P12 IN/NOT IN (:659-705)",
)
_sql(
    "p_case",
    "select l_orderkey, l_linenumber, "
    "case when l_quantity > 30 then 'big' when l_quantity = 30 then 'mid' "
    "else 'small' end as bucket, "
    "case when l_quantity > 30 then l_quantity else l_discount end as colval "
    "from lineitem",
    doc="P13 CASE WHEN first-match-wins, literal + column branches (:708-769, :1022-1037)",
)
_sql(
    "p_distinct",
    "select distinct l_returnflag, l_linestatus from lineitem",
    doc="P14 DISTINCT projection (:108-118)",
)


def _p_mixed_case_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """forest_fires-style schema stress with a DuckDB-checkable oracle.

    The reference's test corpus (pandas_sql_functionality_test.py, mixed
    case ``RH``, tables resolved case-insensitively) is mirrored here on
    a fixture derived deterministically from ``customer``, so the
    dialect edge cases get hash attestation, not just pytest.
    """
    eng = engine_for(spark, sf_dir)
    fixture = eng.spark.table("customer").selectExpr(
        "c_custkey as Number",
        "c_name as `Customer Name`",
        "c_acctbal as RH",
        "c_mktsegment as Segment",
    )
    eng.register_temp_table(fixture, "fixture_mixed")
    # lowercase refs to mixed-case columns; case-insensitive table name;
    # double-quoted spaced identifier — all through the shim.
    return eng.query(
        'select number as num, "Customer Name" as cust_name, rh as acct '
        "from FIXTURE_mixed where rh > 1000.0 and segment = 'BUILDING'"
    )


CATALOG["p_mixed_case_schema"] = QuerySpec(
    fn=_p_mixed_case_fn,
    oracle=(
        'WITH fixture_mixed AS (SELECT c_custkey AS "Number", '
        'c_name AS "Customer Name", c_acctbal AS "RH", '
        'c_mktsegment AS "Segment" FROM customer) '
        'SELECT "Number" AS num, "Customer Name" AS cust_name, "RH" AS acct '
        'FROM fixture_mixed WHERE "RH" > 1000.0 AND "Segment" = \'BUILDING\''
    ),
    doc="mixed-case column resolution (ref tests' RH pattern, :53-62) + "
    "case-insensitive table lookup, oracled on a customer-derived fixture",
)


def _p_spaced_columns_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spaced identifiers ('Equip Slots' pattern, ref tests :487-494)
    inside filters and aggregates, on a part-derived fixture."""
    eng = engine_for(spark, sf_dir)
    fixture = eng.spark.table("part").selectExpr(
        "p_partkey as `Part Key`",
        "p_brand as Brand",
        "p_retailprice as `Retail Price`",
        "p_size as `Size Class`",
    )
    eng.register_temp_table(fixture, "fixture_spaced")
    return eng.query(
        'select brand, count(*) as cnt, '
        'cast(sum(cast("Retail Price" as decimal(18,2))) as double) as sum_price, '
        'max("Part Key") as max_key from fixture_spaced '
        'where "Size Class" in (1, 5, 10, 23) group by brand'
    )


CATALOG["p_spaced_columns"] = QuerySpec(
    fn=_p_spaced_columns_fn,
    oracle=(
        'WITH fixture_spaced AS (SELECT p_partkey AS "Part Key", '
        'p_brand AS "Brand", p_retailprice AS "Retail Price", '
        'p_size AS "Size Class" FROM part) '
        'SELECT "Brand" AS brand, count(*) AS cnt, '
        'CAST(sum(CAST("Retail Price" AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, '
        'max("Part Key") AS max_key FROM fixture_spaced '
        'WHERE "Size Class" IN (1, 5, 10, 23) GROUP BY "Brand"'
    ),
    doc="spaced column names in projection/filter/aggregate "
    "(ref tests :487-494 'Equip Slots'), decimal-exact double sum",
)

# --- §2.3 date/time -------------------------------------------------------

_sql(
    "d_timestamp_fn",
    "select o_orderkey, timestamp('1995-03-15', '10:30:00') as ts0 from orders "
    "where o_orderdate > cast('1995-06-01' as datetime64)",
    oracle="SELECT o_orderkey, TIMESTAMP '1995-03-15 10:30:00' AS ts0 FROM orders "
    "WHERE o_orderdate > CAST('1995-06-01' AS TIMESTAMP)",
    doc="D3 timestamp(date,time) builder (:1008,:1014); D4 cast datetime64 (:985-997). "
    "now()/today() (D1/D2) are wall-clock-dependent → covered in tests/, not oracled.",
)

# --- §2.4 joins -----------------------------------------------------------

_sql(
    "j_inner",
    "select o_orderpriority, count(*) as c from lineitem "
    "join orders on l_orderkey = o_orderkey group by o_orderpriority",
    doc="J1 bare join ≡ inner (utils:93-105); qualified/bare ON columns (:131-167)",
)
_sql(
    "j_left",
    "select c_custkey, c_name, o_orderkey from customer "
    "left join (select * from orders where o_totalprice > 150000) big_orders "
    "on c_custkey = o_custkey",
    doc="J2 left outer join, null-extension verified (utils:99-100)",
)
_sql(
    "j_right",
    "select o_orderkey, c_custkey from "
    "(select * from orders where o_totalprice > 150000) big_orders "
    "right outer join customer on c_custkey = o_custkey",
    doc="J3 right outer join (utils:101-102)",
)
_sql(
    "j_full",
    "select c_custkey, s_suppkey from customer "
    "full outer join supplier on c_nationkey = s_nationkey",
    doc="J4 full outer join (utils:97-98)",
)
_sql(
    "j_cross",
    "select r_name, n_name from region cross join nation",
    doc="J5 explicit CROSS JOIN (:170-186)",
)
_sql(
    "j_comma_implicit",
    "select r_name, n_name from region, nation where r_regionkey = n_regionkey",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation "
    "WHERE r_regionkey = n_regionkey",
    doc="J6 implicit comma-FROM cross join (:434-453); shim rewrites to CROSS JOIN",
)
_sql(
    "j_self_alias",
    "select t1.n_name as n1, t2.n_name as n2 from nation t1, nation t2 "
    "where t1.n_regionkey = t2.n_regionkey and t1.n_nationkey < t2.n_nationkey",
    oracle="SELECT t1.n_name AS n1, t2.n_name AS n2 FROM nation t1 CROSS JOIN nation t2 "
    "WHERE t1.n_regionkey = t2.n_regionkey AND t1.n_nationkey < t2.n_nationkey",
    doc="J7 self cross join with table aliases — xfail in reference (:456-484), native here",
)

# --- §2.5 aggregation -----------------------------------------------------

_sql(
    "a_global",
    "select min(l_quantity) as min_q, max(l_quantity) as max_q, "
    "sum(l_quantity) as sum_q, count(l_quantity) as cnt_q, count(*) as cnt, "
    f"{dsum('l_extendedprice', 'sum_price')}, {davg('l_discount', 'avg_disc')} "
    "from lineitem",
    doc="A1-A6 global aggregates, several in one SELECT (:201-279, :1170-1193)",
)
_sql(
    "a_groupby_bare",
    "select l_returnflag, l_linestatus from lineitem "
    "group by l_returnflag, l_linestatus",
    doc="A7 bare GROUP BY acts as DISTINCT (:189-198)",
)
_sql(
    "a_groupby_having",
    "select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty, "
    f"{dsum('l_extendedprice', 'sum_price')}, count(*) as cnt "
    "from lineitem group by l_returnflag, l_linestatus "
    "having sum(l_quantity) > 100",
    doc="A8 GROUP BY + aggregates (:282-298); A9 HAVING (:401-415)",
)
_sql(
    "a_having_no_groupby",
    "select sum(l_quantity) as s from lineitem having sum(l_quantity) > 0",
    doc="A10 HAVING without GROUP BY — xfail in reference (:361-398), native in Spark",
)
_sql(
    "a_count_distinct",
    "select count(distinct l_orderkey) as d_orders, "
    "count(distinct l_returnflag) as d_flags from lineitem",
    doc="A11 distinct aggregates (extension beyond reference)",
)
_sql(
    "a_rollup",
    "select l_returnflag, l_linestatus, sum(l_quantity) as sq from lineitem "
    "group by rollup(l_returnflag, l_linestatus)",
    doc="A11 ROLLUP (extension)",
)
_sql(
    "a_cube",
    "select l_returnflag, l_linestatus, count(*) as c from lineitem "
    "group by cube(l_returnflag, l_linestatus)",
    doc="A11 CUBE (extension)",
)
_sql(
    "a_grouping_sets",
    "select l_returnflag, l_linestatus, sum(l_quantity) as sq from lineitem "
    "group by grouping sets ((l_returnflag), (l_linestatus))",
    doc="A11 GROUPING SETS (extension)",
)

# --- §2.6 window functions ------------------------------------------------

# W1-W3: global (un-partitioned) rank. The naive plan is Exchange
# SinglePartition + one Window task ranking the whole table — the scale
# killer SCALE.md used to carry as a caveat. These entries now run the
# two-pass range-partitioned operator (operators/rank.py): identical
# results (same DuckDB oracles), no single-partition stage in the plan
# (gated in test_plan_quality.py).


def _w_rank_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.rank import global_rank

    # r15 (guide §2.3): project BEFORE the rank — global_rank's range
    # exchange and eager checkpoint materialize whatever columns they
    # are given, and column pruning cannot reach back through an RDD
    # boundary, so passing the full 16-column lineitem shuffled and
    # checkpointed 4× the bytes the query emits. Rank values are a
    # function of the order columns only — output identical.
    li = engine_for(spark, sf_dir).spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return global_rank(li, [("l_quantity", False)], out_col="rnk").select(
        "l_orderkey", "l_linenumber", "l_quantity", "rnk"
    )


def _w_rank_multi_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.rank import global_rank

    li = engine_for(spark, sf_dir).spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return global_rank(
        li,
        [("l_quantity", False), ("l_extendedprice", True), ("l_orderkey", True)],
        out_col="rnk",
    ).select("l_orderkey", "l_linenumber", "rnk")


def _w_dense_rank_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.rank import global_rank

    li = engine_for(spark, sf_dir).spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return global_rank(li, [("l_quantity", False)], dense=True, out_col="drnk").select(
        "l_orderkey", "l_linenumber", "drnk"
    )


CATALOG["w_rank"] = QuerySpec(
    fn=_w_rank_fn,
    oracle="select l_orderkey, l_linenumber, l_quantity, "
    "rank() over (order by l_quantity desc) as rnk from lineitem",
    doc="W1 rank over order by (:772-786) — xfail in reference; two-pass "
    "range-partitioned here (no single-partition window)",
)
CATALOG["w_rank_multi"] = QuerySpec(
    fn=_w_rank_multi_fn,
    oracle="select l_orderkey, l_linenumber, "
    "rank() over (order by l_quantity desc, l_extendedprice asc, l_orderkey) as rnk "
    "from lineitem",
    doc="W2 multi-key ordered rank (:789-825), two-pass range-partitioned",
)
CATALOG["w_dense_rank"] = QuerySpec(
    fn=_w_dense_rank_fn,
    oracle="select l_orderkey, l_linenumber, "
    "dense_rank() over (order by l_quantity desc) as drnk from lineitem",
    doc="W3 dense_rank (:828-863), two-pass range-partitioned",
)
_sql(
    "w_rank_partition",
    "select l_orderkey, l_linenumber, l_returnflag, "
    "rank() over (partition by l_returnflag order by l_quantity desc) as rnk, "
    "dense_rank() over (partition by l_returnflag order by l_quantity desc) as drnk "
    "from lineitem",
    doc="W4/W5 partitioned (dense_)rank (:866-967)",
)
# (l_orderkey, l_linenumber) is NOT unique in the synthetic testdata;
# the full 5-key order below is — required for a deterministic frame
_W_ORD = "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax"
_sql(
    "w_frames",
    "select l_orderkey, l_linenumber, "
    f"sum(l_quantity) over (partition by l_orderkey order by {_W_ORD} "
    "rows between unbounded preceding and current row) as running_qty "
    "from lineitem",
    doc="W6 frame specs (extension; absent from reference)",
)
_sql(
    "w_lag_lead",
    "select l_orderkey, l_linenumber, "
    f"lag(l_quantity) over (partition by l_orderkey order by {_W_ORD}) as prev_q, "
    f"lead(l_quantity) over (partition by l_orderkey order by {_W_ORD}) as next_q, "
    f"row_number() over (partition by l_orderkey order by {_W_ORD}) as rn "
    "from lineitem",
    doc="W6 lag/lead/row_number (extension)",
)
_sql(
    "w_analytics",
    "select l_orderkey, l_linenumber, "
    f"ntile(4) over (partition by l_returnflag order by {_W_ORD}, l_orderkey) as quartile, "
    f"round(percent_rank() over (partition by l_returnflag order by {_W_ORD}, l_orderkey), 8) as pr, "
    f"round(cume_dist() over (partition by l_returnflag order by {_W_ORD}, l_orderkey), 8) as cd, "
    f"first_value(l_quantity) over (partition by l_orderkey order by {_W_ORD}) as first_q, "
    f"last_value(l_quantity) over (partition by l_orderkey order by {_W_ORD} "
    "rows between unbounded preceding and unbounded following) as last_q "
    "from lineitem",
    doc="W6 analytic functions: ntile / percent_rank / cume_dist / "
    "first_value / last_value with explicit full frame (extension)",
)

# --- §2.7 sort / limit ----------------------------------------------------

_sql(
    "o_orderby_limit",
    "select l_orderkey, l_linenumber, l_extendedprice from lineitem "
    "order by l_extendedprice desc, l_orderkey asc, l_linenumber limit 10",
    doc="O1-O3 multi-key ORDER BY + LIMIT top-k (:335-358, :537-540); "
    "unique-key tiebreak keeps the result set deterministic",
)
_sql(
    "o_limit_offset",
    "select o_orderkey, o_totalprice from orders "
    "order by o_totalprice desc, o_orderkey limit 20 offset 10",
    doc="O4 LIMIT/OFFSET (grammar sql_select_query.py:78)",
)
_sql(
    "o_orderby_ordinal",
    "select o_orderpriority, count(*) as c from orders "
    "group by o_orderpriority order by 2 desc, 1",
    doc="O5 positional ORDER BY (grammar :76-77)",
)

# --- §2.8 set operations --------------------------------------------------

_SET_LEFT = "select l_orderkey as k from lineitem where l_quantity > 49"
_SET_RIGHT = "select o_orderkey as k from orders where o_totalprice > 300000"
_sql(
    "u_union",
    f"{_SET_LEFT} union {_SET_RIGHT}",
    doc="U1 UNION dedups (:529-548)",
)
_sql(
    "u_union_all",
    f"{_SET_LEFT} union all {_SET_RIGHT}",
    doc="U2 UNION ALL keeps duplicates (:551-566)",
)
_sql(
    "u_intersect",
    f"{_SET_LEFT} intersect {_SET_RIGHT}",
    doc="U3 INTERSECT DISTINCT (:569-587)",
)
_sql(
    "u_except",
    f"{_SET_LEFT} except {_SET_RIGHT}",
    doc="U4 EXCEPT — ANSI left-minus-right; the reference's own oracle computes "
    "symmetric difference (:602-614), a documented divergence (SURVEY §2.8 note)",
)
_sql(
    "u_intersect_all",
    f"{_SET_LEFT} intersect all {_SET_RIGHT}",
    doc="U6 INTERSECT ALL (grammar :79-80)",
)
_sql(
    "u_except_all",
    f"{_SET_LEFT} except all {_SET_RIGHT}",
    doc="U5 EXCEPT ALL, ANSI semantics (:617-638 divergence documented)",
)

# --- §2.9 subqueries / composition ---------------------------------------

_sql(
    "q_subquery_nested",
    "select k, cnt from (select l_orderkey as k, count(*) as cnt from "
    "(select * from lineitem where l_quantity > 20) big group by l_orderkey) g "
    "where cnt > 3",
    doc="Q1/Q2 derived tables, 2 levels (:121-128, :497-508)",
)
_sql(
    "q_cte",
    "with big as (select * from orders where o_totalprice > 200000) "
    "select o_orderpriority, count(*) as c from big group by o_orderpriority",
    doc="Q3 CTE (extension; absent from reference grammar)",
)
_sql(
    "q_scalar_subquery",
    # price > 1.8·avg(price), stated in exact integer cents: the naive
    # `> 1.8 * (select avg(...))` form returned 0 rows at sf>=0.01
    # (trivially-green attestation) and a double avg threshold is the
    # cross-engine accumulation-order trap x_pagerank documented. Cents
    # via round(x*100) are engine-identical (one IEEE multiply), and
    # price_cents·10·n > 18·sum_cents is pure int64 on both engines.
    "select o_orderkey, o_totalprice from orders "
    "where cast(round(o_totalprice * 100) as bigint) "
    "* (select count(*) * 10 from orders) "
    "> (select sum(cast(round(o_totalprice * 100) as bigint)) * 18 "
    "from orders)",
    doc="Q3 scalar subquery (extension; selects ~1% of orders at any sf)",
)
_sql(
    "q_in_subquery",
    "select c_custkey from customer where c_custkey in "
    "(select o_custkey from orders where o_totalprice > 300000)",
    doc="Q3 IN-subquery (extension)",
)
_sql(
    "q_exists_correlated",
    "select c_custkey from customer where exists "
    "(select 1 from orders where o_custkey = c_custkey and o_totalprice > 300000)",
    doc="Q3 correlated EXISTS (extension); Catalyst decorrelates to a semi-join",
)

# --- headline TPC-H-shaped queries (multi-operator integration) -----------

_sql(
    "tpch_q1_pricing",
    "select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty, "
    f"{dsum('l_extendedprice', 'sum_base_price')}, "
    "count(*) as count_order from lineitem "
    "where l_shipdate <= cast('1998-09-02' as datetime64) "
    "group by l_returnflag, l_linestatus "
    "order by l_returnflag, l_linestatus",
    oracle="SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
    "cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price, "
    "count(*) AS count_order FROM lineitem "
    "WHERE l_shipdate <= CAST('1998-09-02' AS TIMESTAMP) "
    "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    doc="TPC-H Q1 shape: scan-filter-agg-sort integration",
)
_sql(
    "tpch_q3_shipping",
    "select l_orderkey, "
    "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) "
    "as revenue, o_orderdate "
    "from customer join orders on c_custkey = o_custkey "
    "join lineitem on l_orderkey = o_orderkey "
    "where c_mktsegment = 'BUILDING' "
    "and o_orderdate < cast('1998-03-15' as datetime64) "
    "and l_shipdate > cast('1998-03-15' as datetime64) "
    "group by l_orderkey, o_orderdate "
    "order by revenue desc, l_orderkey limit 10",
    oracle="SELECT l_orderkey, "
    "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) "
    "AS revenue, o_orderdate "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "WHERE c_mktsegment = 'BUILDING' "
    "AND o_orderdate < CAST('1998-03-15' AS TIMESTAMP) "
    "AND l_shipdate > CAST('1998-03-15' AS TIMESTAMP) "
    "GROUP BY l_orderkey, o_orderdate "
    "ORDER BY revenue DESC, l_orderkey LIMIT 10",
    doc="TPC-H Q3 shape: selective 3-way join + top-k revenue "
    "(TakeOrderedAndProject over grouped join)",
)
_sql(
    "tpch_q10_returns",
    "select c_custkey, c_name, "
    "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) "
    "as revenue, n_name "
    "from customer join orders on c_custkey = o_custkey "
    "join lineitem on l_orderkey = o_orderkey "
    "join nation on c_nationkey = n_nationkey "
    "where l_returnflag = 'R' "
    "group by c_custkey, c_name, n_name "
    "order by revenue desc, c_custkey limit 20",
    oracle="SELECT c_custkey, c_name, "
    "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) "
    "AS revenue, n_name "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
    doc="TPC-H Q10 shape: returned-item ranking, fact join + broadcast dims",
)
_sql(
    "tpch_q18_big_orders",
    "select c_custkey, o_orderkey, o_totalprice, sum(l_quantity) as total_qty "
    "from customer join orders on c_custkey = o_custkey "
    "join lineitem on o_orderkey = l_orderkey "
    "where o_orderkey in (select l_orderkey from lineitem "
    "group by l_orderkey having sum(l_quantity) > 150) "
    "group by c_custkey, o_orderkey, o_totalprice "
    "order by o_totalprice desc, o_orderkey limit 20",
    oracle="SELECT c_custkey, o_orderkey, o_totalprice, sum(l_quantity) AS total_qty "
    "FROM customer JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
    "GROUP BY l_orderkey HAVING sum(l_quantity) > 150) "
    "GROUP BY c_custkey, o_orderkey, o_totalprice "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    doc="TPC-H Q18 shape: IN-subquery with HAVING feeding a 3-way join "
    "(semi-join pushdown + top-k)",
)
_sql(
    "tpch_q5_revenue",
    "select n_name, "
    "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) "
    "as revenue "
    "from customer join orders on c_custkey = o_custkey "
    "join lineitem on l_orderkey = o_orderkey "
    "join nation on c_nationkey = n_nationkey "
    "group by n_name",
    doc="TPC-H Q5 shape: 4-way join + grouped revenue; nation/region broadcast at scale",
)


# --------------------------------------------------------------------------
# exports for __spark_entry__.py
# --------------------------------------------------------------------------


def _make_runner(spec: QuerySpec) -> Callable[[SparkSession, str], DataFrame]:
    if spec.fn is not None:
        return spec.fn

    def run(spark: SparkSession, sf_dir: str, _sql: str = spec.engine_sql) -> DataFrame:
        return engine_for(spark, sf_dir).query(_sql)

    return run


# Export order for queries()/oracle_sql(). The driver evaluates entries
# in dict order and scores only the first 50 — so the window rotates
# each round until every catalog entry has a driver-green CORRECTNESS
# row. Everything below position 50 still ships; nothing is dropped.
#
# ATTESTATION ROTATION SCHEDULE (updated 2026-08-15, round 9). Driver-
# green history per entry is in COVERAGE.md's "driver round" column.
#   r6+r7 (scored twice, identical): §2 grammar core — 41 entries
#       (p_/d_/j_/a_/w_/o_/u_/q_) + 2 dialect stresses + 7 anchors.
#   r8: streaming st_* (7), time-series ts_* (5), functions f_* (17 —
#       16 green; f_array_setops errored in the driver's canonicalizer
#       on raw array output, fixed + re-staged below), extended joins
#       (6), set-op variants (2), window variants (2),
#       p_null_semantics, q_recursive_cte, dd_substring_remove
#       → 41 banked + 8 anchors. Cumulative after r8: 153/234.
#   r9 (this file, positions 1-50): 8 anchors + f_array_setops
#       (serialized fix, kept in-window to bank it) + the 14
#       never-attested a_* aggregates + x_* part 1 (27 entries).
#       Whole block pre-validated strict at sf0.1 (commits fee2f23/
#       f0cab31: 49/49) and re-swept at sf0.01 this round.
#   r10 (positions 51+, staged in order): x_* part 2 (x_pagerank,
#       x_profile, x_snapshot_diff — the 3 heaviest, each judge- or
#       sweep-verified at sf0.1), the never-attested dd_* block
#       (incl. the r8 replay certificates dd_minhash_banded_verified /
#       dd_simhash_probed_verified / dd_incremental_verified and the
#       rows-only production configs), sim_/emb_ (incl. the fixed
#       emb_quantize_int8, sim_ann_pq_verified, sim_ann_ivf_2level_
#       probed, hash-certified sim_ann_lsh), the txt_* tail, and
#       mm_decode_stub, plus x_dsir_weights (added late in r9) — 41
#       entries; window = 8 anchors + 41 + f_array_setops = 50. After
#       r10 every catalog entry has a driver attestation (rows-only
#       entries get the weaker rows-check; their hash coverage is the
#       certificate entries).
# The rotation is DATA-DRIVEN (round 9): PRIORITY is assembled from
# named blocks, so rotating the next window into scoring position is a
# one-line reorder of the block sum below — no hand-editing of a
# 200-line literal in a possibly-degraded session (round 7 died before
# committing its rotation; this removes the failure mode).
# tests/test_driver_contract.py pins the window; the schedule comment
# above stays the narrative source of truth.

# Anchors: driver-green r2-r8 continuously; every window keeps them so
# it always contains known-good entries spanning TPC-H, dedup,
# similarity, windows, and curation.
_ANCHORS: list[str] = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_revenue",
    "dd_exact",
    "dd_minhash_verified",
    "sim_knn_join",
    "pipe_curation",
    "w_rank",
]

# r9 window block (round 9, scored this round): the fixed
# f_array_setops + the 14 never-attested a_* aggregates + x_* part 1.
_R9_BLOCK: list[str] = [
    "f_array_setops",
    "a_percentile",
    "a_salted_agg",
    "a_stats_agg",
    "a_groupby_all",
    "a_listagg",
    "a_approx_agg",
    "a_maxby_minby",
    "a_grouping_fn",
    "a_percentile_within",
    "a_benford_digits",
    "a_bool_aggs",
    "a_hist_quantile_rollup",
    "a_partial_rollup_merge",
    "a_mode",
    "x_pivot",
    "x_unpivot",
    "x_pivot_dynamic",
    "x_grouped_agg_udaf",
    "x_grouped_map",
    "x_hash_split",
    "x_hash_sample",
    "x_stratified_sample",
    "x_weighted_sample",
    "x_bottomk_sample",
    "x_global_shuffle",
    "x_pack_sequences",
    "x_topk_per_group",
    "x_topk_with_ties",
    "x_file_metadata",
    "x_scd2_intervals",
    "x_dataset_mix",
    "x_quality_topq",
    "x_quality_buckets",
    "x_curriculum_order",
    "x_split_decontaminate",
    "x_score_calibration",
    "x_source_cap",
    "x_sorted_neighborhood",
    "x_negative_pairs",
    "x_winsorize",
    "x_skew_report",
]

# r10 staged block (rotate into scoring position next round by moving
# this term ahead of _R9_BLOCK in PRIORITY): x_* part 2, the dd_*
# tail incl. the r8/r9 replay certificates, sim_/emb_ incl. the fixed
# emb_quantize_int8 and the composed sim_ann_ivfpq_verified, the
# txt_* tail, mm_decode_stub. Pre-validated strict at sf0.1 in round
# 9 (29 hash + 11 rows-only green, zero failures).
_R10_BLOCK: list[str] = [
    "x_pagerank",
    "x_profile",
    "x_snapshot_diff",
    "dd_minhash_banded_verified",
    "dd_simhash_probed_verified",
    "dd_incremental_verified",
    "dd_url_dedup",
    "dd_lines",
    "dd_containment",
    "dd_overlap_matrix",
    "dd_incremental",
    "dd_minhash",
    "dd_minhash_pairs",
    "dd_clusters",
    "dd_simhash",
    "dd_simhash_probed",
    "dd_semantic",
    "sim_ann_pq_verified",
    "sim_ann_ivf_2level_probed",
    "sim_ann_lsh",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_verified",
    "emb_quantize_int8",
    "emb_standardize",
    "emb_kmeans",
    "txt_tfidf",
    "txt_bm25",
    "txt_pmi",
    "txt_lm_score",
    "txt_inverted_index",
    "txt_repetition",
    "txt_char_entropy",
    "txt_len_histogram",
    "txt_langid",
    "txt_langid_golden",
    "txt_winnow_fingerprint",
    "txt_winnow_maponly",
    "txt_bpe_tokens",
    "mm_decode_stub",
    "x_dsir_weights",
]

# r11 staged block — FIRST OLDEST-FIRST window (policy switch, round
# 10). With the never-attested backlog retired by the r10 rotation,
# the rotation metric changes from coverage to attestation AGE: each
# round's window = the 8 anchors + the 42 entries whose latest
# driver-green row is stalest (never first, then ascending last-green
# round, ties by catalog order), so a regression in a long-green entry
# cannot hide indefinitely behind an ancient attestation. The block
# below is the deterministic output of
#   python tools/attestation_ledger.py --propose-window --assume-current-green
# at the r10 HEAD (assumes the pre-validated r10 window goes green;
# if any r10 entry comes back red, it re-enters by the same rule —
# red rows don't refresh age — so re-run the tool before swapping).
# r11's first commit: move this term ahead of _R10_BLOCK in PRIORITY
# and regenerate COVERAGE.md.
_R11_BLOCK: list[str] = [
    "o_orderby_limit",  # last green: r2
    "p_select_star",  # last green: r3
    "p_case",  # last green: r3
    "w_rank_partition",  # last green: r3
    "u_union",  # last green: r3
    "q_cte",  # last green: r3
    "tpch_q6_forecast",  # last green: r3
    "tpch_q12_priority_counts",  # last green: r3
    "tpch_q14_promo",  # last green: r3
    "tpch_q10_returns",  # last green: r4
    "x_sessionize",  # last green: r4
    "x_funnel",  # last green: r4
    "mm_blob_meta",  # last green: r4
    "tpch_q2_min_supplier",  # last green: r4
    "tpch_q4_priority",  # last green: r4
    "tpch_q8_mktshare",  # last green: r4
    "tpch_q11_value_parts",  # last green: r4
    "tpch_q16_supplier_cnt",  # last green: r4
    "tpch_q22_idle_custs",  # last green: r4
    "tpch_q18_big_orders",  # last green: r5
    "dd_exact_normalized",  # last green: r5
    "dd_fingerprint",  # last green: r5
    "dd_ngram_jaccard",  # last green: r5
    "dd_clusters_verified",  # last green: r5
    "dd_embedding",  # last green: r5
    "dd_substring_spans",  # last green: r5
    "dd_decontaminate",  # last green: r5
    "dd_prefix_pairs",  # last green: r5
    "dd_bloom_cert",  # last green: r5
    "dd_minhash_est_cert",  # last green: r5
    "dd_fuzzy_decontaminate",  # last green: r5
    "sim_topk",  # last green: r5
    "sim_knn_join_probed",  # last green: r5
    "sim_ann_ivf",  # last green: r5
    "sim_ann_ivf_probed",  # last green: r5
    "sim_ann_recall_cert",  # last green: r5
    "txt_stats",  # last green: r5
    "txt_quality",  # last green: r5
    "txt_pii_scrub",  # last green: r5
    "txt_bpe_roundtrip",  # last green: r5
    "txt_chunks",  # last green: r5
    "txt_word_rarity",  # last green: r5
]

# §2 grammar core + previously-green entries (driver rounds in
# COVERAGE.md); everything not listed follows in definition order via
# _ordered_names().
_PRIOR_GREEN: list[str] = [
    "p_project_alias",
    "p_autonaming",
    "p_arith",
    "p_string_literal",
    "p_cast",
    "p_filter_predicates",
    "p_between_in",
    "p_distinct",
    "d_timestamp_fn",
    "j_inner",
    "j_left",
    "j_right",
    "j_full",
    "j_cross",
    "j_comma_implicit",
    "j_self_alias",
    "a_global",
    "a_groupby_bare",
    "a_groupby_having",
    "a_having_no_groupby",
    "a_count_distinct",
    "a_rollup",
    "a_cube",
    "a_grouping_sets",
    "w_rank_multi",
    "w_dense_rank",
    "w_frames",
    "w_lag_lead",
    "w_analytics",
    "o_limit_offset",
    "o_orderby_ordinal",
    "u_union_all",
    "u_intersect",
    "u_except",
    "u_intersect_all",
    "u_except_all",
    "q_subquery_nested",
    "q_scalar_subquery",
    "q_in_subquery",
    "q_exists_correlated",
    "p_mixed_case_schema",
    "p_spaced_columns",
    "p_select_star",
    "p_case",
    "w_rank_partition",
    "u_union",
    "q_cte",
    "o_orderby_limit",
]

# ROUND 11 ROTATION (executed): first OLDEST-FIRST window — 8 anchors
# + the 42 stalest attestations (r2–r5 cohort). Verified against the
# REAL CORRECTNESS_r10.json via a fresh
#   python tools/attestation_ledger.py --propose-window
# (no --assume flag; rows-only r10 rows count green per _row_green —
# they were attested in the r10 window with certificates green in the
# same window) — the fresh proposal matched the staged block exactly,
# 42/42 names in order.
# ROUND 12 ROTATION (executed): deterministic output of
#   python tools/attestation_ledger.py --propose-window
# against the REAL CORRECTNESS_r11.json (50/50 green, so no red
# re-entries). Refresh targets: the r5-era join/sketch/tpch cohort
# plus the head of the r6/r7 dialect/join/agg block — exactly the
# stalest-42 by last-green round, ties by catalog order.
# ROUND 13 RECIPE: re-run --propose-window once CORRECTNESS_r12
# exists, stage _R13_BLOCK, and set
#   PRIORITY = _ANCHORS + _R13_BLOCK + _R12_BLOCK + ... + _PRIOR_GREEN
# ROUND 14 ROTATION (executed): deterministic output of
#   python tools/attestation_ledger.py --propose-window
# against the REAL CORRECTNESS_r13.json (50/50 green, so no red
# re-entries). Refresh targets: the r7 window/setop/subquery tail
# plus the r8 streaming/timeseries/join block — exactly the
# stalest-42 by last-green round, ties by catalog order. This
# executes the rotation r13 staged-but-skipped (VERDICT r13 item 1).
_R14_BLOCK: list[str] = [
    "a_cube",  # last green: r7
    "a_grouping_sets",  # last green: r7
    "w_rank_multi",  # last green: r7
    "w_dense_rank",  # last green: r7
    "w_frames",  # last green: r7
    "w_lag_lead",  # last green: r7
    "w_analytics",  # last green: r7
    "o_limit_offset",  # last green: r7
    "o_orderby_ordinal",  # last green: r7
    "u_union_all",  # last green: r7
    "u_intersect",  # last green: r7
    "u_except",  # last green: r7
    "u_intersect_all",  # last green: r7
    "u_except_all",  # last green: r7
    "q_subquery_nested",  # last green: r7
    "q_scalar_subquery",  # last green: r7
    "q_in_subquery",  # last green: r7
    "q_exists_correlated",  # last green: r7
    "p_mixed_case_schema",  # last green: r7
    "p_spaced_columns",  # last green: r7
    "dd_substring_remove",  # last green: r8
    "st_tumbling",  # last green: r8
    "st_sliding",  # last green: r8
    "st_session",  # last green: r8
    "st_static_join",  # last green: r8
    "st_rollup_multires",  # last green: r8
    "st_stream_join",  # last green: r8
    "st_dedup",  # last green: r8
    "ts_gapfill",  # last green: r8
    "ts_anomaly_mad",  # last green: r8
    "ts_anomaly",  # last green: r8
    "ts_ohlc_resample",  # last green: r8
    "ts_ewma",  # last green: r8
    "j_asof",  # last green: r8
    "q_recursive_cte",  # last green: r8
    "j_semi",  # last green: r8
    "j_anti",  # last green: r8
    "u_symdiff",  # last green: r8
    "j_salted",  # last green: r8
    "p_null_semantics",  # last green: r8
    "w_time_range",  # last green: r8
    "j_hint_broadcast",  # last green: r8
]

_R12_BLOCK: list[str] = [
    "j_bloom_prefilter",  # last green: r5
    "j_interval_overlap",  # last green: r5
    "a_hll_sketch_rollup",  # last green: r5
    "a_hll_intersect_cert",  # last green: r5
    "a_cms_heavy_hitters",  # last green: r5
    "x_cohort_retention",  # last green: r5
    "x_temperature_mix",  # last green: r5
    "x_record_linkage",  # last green: r5
    "g_triangles",  # last green: r5
    "mm_audio_chunks",  # last green: r5
    "mm_video_frames",  # last green: r5
    "pipe_dedup_funnel",  # last green: r5
    "tpch_q7_volume",  # last green: r5
    "tpch_q9_profit",  # last green: r5
    "tpch_q13_custdist",  # last green: r5
    "tpch_q15_top_supplier",  # last green: r5
    "tpch_q17_small_qty",  # last green: r5
    "tpch_q19_disjunctive",  # last green: r5
    "tpch_q21_waiting",  # last green: r5
    "tpch_q20_share_suppliers",  # last green: r5
    "p_project_alias",  # last green: r7
    "p_autonaming",  # last green: r7
    "p_arith",  # last green: r7
    "p_string_literal",  # last green: r7
    "p_cast",  # last green: r7
    "p_filter_predicates",  # last green: r7
    "p_between_in",  # last green: r7
    "p_distinct",  # last green: r7
    "d_timestamp_fn",  # last green: r7
    "j_inner",  # last green: r7
    "j_left",  # last green: r7
    "j_right",  # last green: r7
    "j_full",  # last green: r7
    "j_cross",  # last green: r7
    "j_comma_implicit",  # last green: r7
    "j_self_alias",  # last green: r7
    "a_global",  # last green: r7
    "a_groupby_bare",  # last green: r7
    "a_groupby_having",  # last green: r7
    "a_having_no_groupby",  # last green: r7
    "a_count_distinct",  # last green: r7
    "a_rollup",  # last green: r7
]

PRIORITY: list[str] = (
    _ANCHORS
    + _R14_BLOCK
    + _R12_BLOCK
    + _R11_BLOCK
    + _R10_BLOCK
    + _R9_BLOCK
    + _PRIOR_GREEN
)


def _ordered_names() -> list[str]:
    from . import registry_ext, registry_tpch  # noqa: F401  (extend CATALOG on import)

    missing = [n for n in PRIORITY if n not in CATALOG]
    assert not missing, f"PRIORITY names not in CATALOG: {missing}"
    # first occurrence wins: oldest-first blocks (r11+) intentionally
    # repeat names already listed in older blocks / _PRIOR_GREEN, so a
    # rotation stays a one-line block reorder with no hand-deduping
    head = list(dict.fromkeys(PRIORITY))
    rest = [n for n in CATALOG if n not in set(head)]
    return head + rest


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _make_runner(CATALOG[name]) for name in _ordered_names()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: CATALOG[name].oracle
        for name in _ordered_names()
        if CATALOG[name].oracle is not None
    }
