"""Dump `.explain("formatted")` plans for the r14 optimization round.

Writes plans/r14/<name>_<tag>.txt for every bench-tracked query (the
BASELINE set + TPCH_SHAPES + PIPELINE_OPS) so before/after plan claims
in OPTIMIZATION_r14.md are checkable without running Spark:

    python tools/dump_plans_r14.py before   # or: after
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import PIPELINE_OPS, QUERIES, TPCH_SHAPES  # noqa: E402
from dataframe_sql_spark.registry import engine_for, spark_queries  # noqa: E402
from dataframe_sql_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plans_r14")
    eng = engine_for(spark, SF_DIR)
    qs = spark_queries()

    def dump(name: str, df) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)

    for name, sql in QUERIES.items():
        if only and name not in only:
            continue
        dump(name, eng.query(sql))
    for name in TPCH_SHAPES + PIPELINE_OPS:
        if only and name not in only:
            continue
        dump(name, qs[name](spark, SF_DIR))
    print(f"wrote plans/r14/*_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
