"""Dump `.explain("formatted")` plans for the r15 optimization round.

Writes plans/r15/<name>_<tag>.txt for bench-tracked queries (BASELINE
set + TPCH_SHAPES + PIPELINE_OPS + any extra names passed) so
before/after plan claims in OPTIMIZATION_r15.md are checkable without
running Spark:

    python tools/dump_plans_r15.py before [names...]
    python tools/dump_plans_r15.py after  [names...]

r15 ledger guard (r14 verdict item 6 — a `_before` dump captured at a
HEAD that already contained the change was committed as evidence):

- every plan file starts with a provenance header recording the git
  HEAD (and dirty state) it was dumped at, so before/after pairs are
  auditable against the commit history;
- an existing `_before` file is never overwritten (re-running the tool
  after the optimization landed would silently replace the genuine
  before-plan with an after-plan under the wrong name). Delete the
  file explicitly if a re-capture at the right commit is intended.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import PIPELINE_OPS, QUERIES, TPCH_SHAPES  # noqa: E402
from dataframe_sql_spark.registry import engine_for, spark_queries  # noqa: E402
from dataframe_sql_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _git_provenance(repo: Path) -> str:
    head = subprocess.run(
        ["git", "-C", str(repo), "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    dirty = subprocess.run(
        ["git", "-C", str(repo), "status", "--porcelain"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    return f"-- dumped at git {head}{' (dirty tree)' if dirty else ''}\n"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    repo = Path(__file__).resolve().parent.parent
    out_dir = repo / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    provenance = _git_provenance(repo)
    spark = get_spark("dump_plans_r15")
    eng = engine_for(spark, SF_DIR)
    qs = spark_queries()

    def dump(name: str, df) -> None:
        target = out_dir / f"{name}_{tag}.txt"
        if tag == "before" and target.exists():
            print(f"REFUSING to overwrite existing before-plan {target}")
            return
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        target.write_text(provenance + plan)

    for name, sql in QUERIES.items():
        if only and name not in only:
            continue
        dump(name, eng.query(sql))
    for name in TPCH_SHAPES + PIPELINE_OPS:
        if only and name not in only:
            continue
        dump(name, qs[name](spark, SF_DIR))
    # names outside the bench dicts (catalog-only entries) are accepted
    # explicitly
    for name in only - set(QUERIES) - set(TPCH_SHAPES) - set(PIPELINE_OPS):
        if name in qs:
            dump(name, qs[name](spark, SF_DIR))
        else:
            print(f"unknown query name {name!r}", file=sys.stderr)
    print(f"wrote plans/r15/*_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
