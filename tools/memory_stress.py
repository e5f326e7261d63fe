"""Memory-pressure gate for the pipeline ops (SCALE.md next-frontier #1).

The 10×/--scale points pay real scan+shuffle I/O but their per-task
payloads sit far below executor memory, so they can't distinguish
"scales linearly" from "scales linearly until it must spill".  This
tool runs ONE heavy op family at a large expansion (default 100× →
500k documents) inside a DELIBERATELY memory-constrained session
(default 2g driver heap — local mode, so executor == driver; override
with SPARK_STRESS_MEMORY) and reports, from the Spark UI REST API:

- whether the job completed (no OOM — the pass/fail axis),
- total memory/disk bytes spilled (spill OBSERVED is the point: the
  op must degrade to spill, not to OOM, when state outgrows the heap),
- wall time, vs the same op at 1× in the same constrained session.

Run from the repo root (fresh process each time — driver memory is a
JVM-launch setting):

    python tools/memory_stress.py [--scale=100] [--op=dd_minhash_pairs]

Prints one JSON line. Expect minutes at 100×.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Bound UI base URL, set from spark.sparkContext.uiWebUrl after the
# session starts — Spark silently rebinds to port+1 when the requested
# port is taken, so a hard-coded port could read ANOTHER app's stats.
UI_BASE = ""


def _rest(app_path: str):
    with urllib.request.urlopen(f"{UI_BASE}/api/v1/{app_path}", timeout=10) as r:
        return json.loads(r.read())


def _spill_totals(app_id: str) -> dict[str, int]:
    stages = _rest(f"applications/{app_id}/stages?status=complete")
    return {
        "memory_spilled_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spilled_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "stages": len(stages),
    }


def main() -> int:
    scale = 100
    op = "dd_minhash_pairs"
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            scale = int(a.split("=", 1)[1])
        elif a.startswith("--op="):
            op = a.split("=", 1)[1]
    heap = os.environ.get("SPARK_STRESS_MEMORY", "2g")

    from pyspark.sql import SparkSession

    from dataframe_sql_spark.session import tune_session

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("memory_stress")
        .config("spark.driver.memory", heap)
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    global UI_BASE
    UI_BASE = spark.sparkContext.uiWebUrl
    tune_session(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    jvm_max = int(
        spark._jvm.java.lang.Runtime.getRuntime().maxMemory()  # noqa: SLF001
    )

    import bench  # repo-root harness; reuses its parquet expansion

    from dataframe_sql_spark.registry import spark_queries

    qs = spark_queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    app_id = spark.sparkContext.applicationId
    out: dict = {
        "metric": "memory_pressure_point",
        "op": op,
        "scale": scale,
        "heap": heap,
        "jvm_max_bytes": jvm_max,
    }
    import shutil

    for label, r in (("1x", 1), (f"{scale}x", scale)):
        d = bench._write_scaled_dir(spark, sf_dir, r, "docs")
        try:
            before = _spill_totals(app_id)
            t0 = time.perf_counter()
            n = qs[op](spark, d).count()
            wall = round(time.perf_counter() - t0, 2)
            after = _spill_totals(app_id)
            out[label] = {
                "rows_out": n,
                "wall_sec": wall,
                "memory_spilled_bytes": after["memory_spilled_bytes"]
                - before["memory_spilled_bytes"],
                "disk_spilled_bytes": after["disk_spilled_bytes"]
                - before["disk_spilled_bytes"],
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)
    out["completed_without_oom"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
