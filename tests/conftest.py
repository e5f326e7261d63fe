from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataframe_sql_spark.engine import SparkSqlEngine  # noqa: E402
from dataframe_sql_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")


@pytest.fixture(scope="session")
def engine(spark):
    eng = SparkSqlEngine(spark)
    eng.register_parquet_dir(SF_DIR)
    return eng
