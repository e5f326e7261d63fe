"""dataframe_sql_spark — a PySpark-native SQL-on-DataFrames engine.

Re-creates the capabilities of zbrookle/dataframe_sql (reference at
/root/reference, surveyed in SURVEY.md) on Spark: the same
register/remove/query API, the same SQL dialect via a token-level shim,
with planning and execution owned entirely by Catalyst/Tungsten — plus
the large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing, streaming) the reference never had.
"""

from .engine import SparkSqlEngine, query, register_temp_table, remove_temp_table
from .session import get_spark

__version__ = "0.1.0"

__all__ = [
    "SparkSqlEngine",
    "get_spark",
    "query",
    "register_temp_table",
    "remove_temp_table",
    "__version__",
]
