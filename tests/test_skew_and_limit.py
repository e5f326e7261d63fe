"""Salted aggregation exactness + MySQL-style LIMIT rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframe_sql_spark.dialect.shim import translate
from dataframe_sql_spark.operators.skew import salted_agg


def test_limit_offset_comma_rewrite():
    out = translate("select * from t order by a limit 5, 10")
    assert "LIMIT 10 OFFSET 5" in out


def test_plain_limit_untouched():
    assert "limit 5" in translate("select * from t limit 5")


def test_salted_agg_equals_plain(spark, engine):
    li = engine.spark.table("lineitem")
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {"s": ("l_quantity", "sum"), "c": ("l_quantity", "count")},
        buckets=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        {"l_quantity": "sum"}
    )
    got = {r.l_returnflag: (r.s, r.c) for r in salted.collect()}
    want_sum = {
        r.l_returnflag: r["sum(l_quantity)"] for r in plain.collect()
    }
    assert set(got) == set(want_sum)
    for k in got:
        assert got[k][0] == pytest.approx(want_sum[k])


def test_salted_join_equals_plain_join(spark, engine):
    from dataframe_sql_spark.operators.skew import salted_join

    li = engine.spark.table("lineitem").select("l_orderkey", "l_linenumber")
    orders = engine.spark.table("orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    salted = salted_join(li, orders, on=["l_orderkey"], buckets=8)
    plain = li.join(orders, on="l_orderkey")
    key = lambda r: (r.l_orderkey, r.l_linenumber, r.o_custkey)  # noqa: E731
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    from dataframe_sql_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "va"])
    b = spark.createDataFrame([(1, "z")], ["k", "vb"])
    out = {(r.k, r.va, r.vb) for r in salted_join(a, b, ["k"], buckets=4, how="left").collect()}
    assert out == {(1, "x", "z"), (2, "y", None)}


def test_salted_join_rejects_build_preserving_types(spark):
    from dataframe_sql_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x")], ["k", "va"])
    b = spark.createDataFrame([(1, "z")], ["k", "vb"])
    with pytest.raises(ValueError, match="probe-preserving"):
        salted_join(a, b, ["k"], how="full")


def test_salted_agg_rejects_non_algebraic(spark):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(spark.range(5), ["id"], {"m": ("id", "median")})
