"""Engine behavior tests against live Spark (reference parity points
that the DuckDB oracle gate can't express — naming, case rules,
registration lifecycle, now()/today()).

Reference citations: /root/reference/dataframe_sql/tests/
pandas_sql_functionality_test.py unless noted.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest


def test_register_query_remove_roundtrip(engine):
    # ref sql_select_query.py:15-61
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    engine.register_temp_table(pdf, "roundtrip_t")
    out = engine.query_pandas("select a from roundtrip_t where a > 1")
    assert sorted(out["a"].tolist()) == [2, 3]
    engine.remove_temp_table("roundtrip_t")
    with pytest.raises(Exception):
        engine.query("select * from roundtrip_t")


def test_remove_unregistered_raises(engine):
    # ref sql_select_query.py:42-61 raises on unknown table
    with pytest.raises(KeyError):
        engine.remove_temp_table("no_such_table_xyz")


def test_explain_returns_physical_plan(engine):
    plan = engine.explain("select l_orderkey from lineitem where l_quantity > 45")
    assert "Physical Plan" in plan and "PushedFilters" in plan


def test_query_unknown_table_raises_analysis_error(engine):
    # SURVEY §5: the reference's historical error-path tests covered
    # unknown-table queries (performance_tests.py DONT_TEST names)
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        engine.query("select * from table_that_never_was").collect()


def test_query_invalid_syntax_raises_parse_error(engine):
    from pyspark.errors import ParseException

    with pytest.raises(ParseException):
        engine.query("select select group from from").collect()


def test_table_name_case_insensitive(engine):
    # ref :43-50 test_case_insensitivity
    pdf = pd.DataFrame({"v": [1]})
    engine.register_temp_table(pdf, "case_test")
    assert engine.query_pandas("select * from CASE_test")["v"].tolist() == [1]
    engine.remove_temp_table("case_test")


def test_column_case_as_typed(engine):
    # ref :487-494 test_maintain_case_in_query: output named as typed
    pdf = pd.DataFrame({"Wind": [1.0], "RH": [2.0]})
    engine.register_temp_table(pdf, "case_cols")
    out = engine.query_pandas("select wind, rh from case_cols")
    assert list(out.columns) == ["wind", "rh"]
    out2 = engine.query_pandas("select Wind, RH from case_cols")
    assert list(out2.columns) == ["Wind", "RH"]
    engine.remove_temp_table("case_cols")


def test_colN_naming_live(engine):
    # ref :262-279
    out = engine.query_pandas("select min(l_quantity), max(l_quantity) from lineitem")
    assert list(out.columns) == ["_col0", "_col1"]


def test_now_today_columns(engine):
    # ref :1000-1015: now()/today() keep their spelling as column names
    out = engine.query_pandas("select now(), today() from nation")
    assert list(out.columns) == ["now()", "today()"]
    assert isinstance(out["now()"].iloc[0], (pd.Timestamp, datetime.datetime))
    today = out["today()"].iloc[0]
    assert pd.Timestamp(today).date() == datetime.datetime.now(datetime.timezone.utc).date()


def test_comma_join_collision_prefix(engine):
    # ref :434-453 + utils:48-89: colliding output columns prefixed table.col
    left = pd.DataFrame({"id": [1, 2], "lval": ["a", "b"]})
    right = pd.DataFrame({"id": [10], "rval": ["z"]})
    engine.register_temp_table(left, "cp_left")
    engine.register_temp_table(right, "cp_right")
    out = engine.query_pandas("select * from cp_left, cp_right")
    assert sorted(out.columns) == ["cp_left.id", "cp_right.id", "lval", "rval"]
    assert len(out) == 2
    engine.remove_temp_table("cp_left")
    engine.remove_temp_table("cp_right")


def test_multiple_aliases_of_one_column(engine):
    # ref :1040-1058
    out = engine.query_pandas(
        "select l_quantity as a, l_quantity as b, l_quantity as c from lineitem limit 5"
    )
    assert list(out.columns) == ["a", "b", "c"]


def test_case_first_match_wins(engine):
    # ref :1022-1037: duplicate conditions, first wins
    pdf = pd.DataFrame({"x": [1, 2]})
    engine.register_temp_table(pdf, "case_dup")
    out = engine.query_pandas(
        "select case when x > 0 then 'first' when x > 0 then 'second' else 'no' end as r "
        "from case_dup"
    )
    assert out["r"].tolist() == ["first", "first"]
    engine.remove_temp_table("case_dup")


def test_distinct_dedups(engine):
    pdf = pd.DataFrame({"x": [1, 1, 2, 2, 3]})
    engine.register_temp_table(pdf, "dist_t")
    out = engine.query_pandas("select distinct x from dist_t")
    assert sorted(out["x"].tolist()) == [1, 2, 3]
    engine.remove_temp_table("dist_t")


def test_float16_and_category_promoted(engine):
    # SURVEY §7 hard part 2: float16→FLOAT, category→STRING divergence
    pdf = pd.DataFrame({"x": [1.5, 2.5], "c": ["a", "b"]})
    engine.register_temp_table(pdf, "promo_t")
    out = engine.query("select cast(x as float16) as f, cast(c as category) as s from promo_t")
    types = dict(out.dtypes)
    assert types["f"] == "float" and types["s"] == "string"
    engine.remove_temp_table("promo_t")


def test_lazy_dataframe_returned(engine):
    df = engine.query("select * from lineitem")
    # no job should have run; plan must be analyzable
    assert df.schema.fieldNames()[0] == "l_orderkey"


def test_engine_cache_is_per_session_and_weak(spark):
    # VERDICT r1 #4: id(spark) cache could alias a new session onto a
    # dead engine. WeakKeyDictionary keyed on the session object gives
    # one engine per live session and drops entries on collection.
    from dataframe_sql_spark.registry import _ENGINES, engine_for

    sf = "/root/testdata/sf0.001"
    e1 = engine_for(spark, sf)
    assert engine_for(spark, sf) is e1  # cached
    other = spark.newSession()  # distinct session object, same JVM
    e2 = engine_for(other, sf)
    assert e2 is not e1
    assert e2.spark is other
    import gc

    del other, e2
    gc.collect()
    assert all(s is not None for s in _ENGINES)  # no dead keys retained


def test_engine_confs_applied_to_foreign_session(spark):
    # The driver hands in its own session; engine_for must make it able
    # to read events.parquet (nanos) and use UTC semantics.
    fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    fresh.conf.set("spark.sql.session.timeZone", "America/New_York")
    from dataframe_sql_spark.registry import engine_for

    eng = engine_for(fresh, "/root/testdata/sf0.001")
    assert fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert fresh.conf.get("spark.sql.session.timeZone") == "UTC"
    assert eng.spark.table("events").count() > 0
    # honest scan-size estimates (r12: the default factor of 1.0 let a
    # column-pruned fact scan broadcast — OOM-class at 100 TB); a
    # dropped factor must fail here, on the foreign-session path too
    assert (
        fresh.conf.get("spark.sql.sources.fileCompressionFactor") == "3.0"
    )
    # the measured SHJ lever (r13): sort-free hash joins where a side's
    # honest estimate fits the per-partition build; a dropped conf
    # reverts every unhinted big join to two extra sort passes
    assert fresh.conf.get("spark.sql.join.preferSortMergeJoin") == "false"
    assert (
        fresh.conf.get(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
        )
        == "64MB"
    )


def test_pivot_dynamic_cardinality_guard(spark):
    # A pivot column with unbounded cardinality must fail fast instead
    # of collecting the world onto the driver.
    from dataframe_sql_spark.registry_ext import _pivot_dynamic

    with pytest.raises(ValueError, match="cardinality"):
        _pivot_dynamic(spark, "/root/testdata/sf0.001", max_columns=2)
