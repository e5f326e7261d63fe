"""as-of / range join semantics (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataframe_sql_spark.operators.joins import asof_join, range_join, symmetric_difference


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_backward_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(12)), (3, "u2", _ts(9))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [("u1", _ts(9), 100.0), ("u1", _ts(11), 200.0), ("u2", _ts(10), 300.0)],
        ["user_id", "ts", "price"],
    )
    out = {r.event_id: r.price for r in asof_join(left, right, on="ts", by="user_id").collect()}
    assert out[1] == 100.0  # latest right ≤ 10:00 is 09:00
    assert out[2] == 200.0  # latest right ≤ 12:00 is 11:00
    assert out[3] is None  # u2 has no right row ≤ 09:00


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([("u", _ts(10), 5.0)], ["user_id", "ts", "price"])
    out = asof_join(left, right, on="ts", by="user_id").collect()
    assert out[0].price == 5.0


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, "u", _ts(12))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([("u", _ts(9), 7.0)], ["user_id", "ts", "price"])
    out = asof_join(left, right, on="ts", by="user_id", tolerance="'1' HOUR").collect()
    assert out[0].price is None  # 3h-old match exceeds 1h tolerance


def test_range_join_bucketed_equals_naive(spark):
    points = spark.createDataFrame(
        [(i, _ts(9 + i % 6, 7 * i % 60)) for i in range(20)], ["pid", "ts"]
    )
    intervals = spark.createDataFrame(
        [(100, _ts(9), _ts(11)), (200, _ts(10, 30), _ts(12, 30)), (300, _ts(14), _ts(15))],
        ["iid", "start", "end"],
    )
    naive = {
        (r.pid, r.iid)
        for r in range_join(points, intervals, "ts", "start", "end").collect()
    }
    bucketed = {
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, "ts", "start", "end", bucket_granularity="hour"
        ).collect()
    }
    assert naive == bucketed and len(naive) > 0


def test_symmetric_difference_matches_reference_oracle(spark):
    # mirrors the pandas merge-indicator EXCEPT oracle (ref :602-614)
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (4,)], ["k"])
    got = sorted(r.k for r in symmetric_difference(a, b).collect())
    assert got == [1, 3, 4]  # 2 in both → dropped entirely; dups collapsed
