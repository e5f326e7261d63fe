"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dataframe_sql_spark`` (registry.py holds the
catalog; engine.py the dialect-shim + spark.sql engine).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dataframe_sql_spark.registry import engine_for, oracle_sqls, spark_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 4-way join + grouped revenue)
    on /root/testdata/sf0.001; driver checks rows>0."""
    eng = engine_for(spark, "/root/testdata/sf0.001")
    return eng.query(
        "select n_name, "
        "cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) "
        "as revenue, count(*) as n_lineitems "
        "from customer join orders on c_custkey = o_custkey "
        "join lineitem on l_orderkey = o_orderkey "
        "join nation on c_nationkey = n_nationkey "
        "group by n_name"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI equivalents; keys match ``queries()``."""
    return oracle_sqls()
