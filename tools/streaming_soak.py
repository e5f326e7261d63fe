"""Streaming soak: 120 micro-batches through the stateful
checkpoint-restart path with repeated injected failures (SCALE.md
round-9 frontier, delivered round 10).

The per-round streaming gates prove exactly-once across ONE failure at
ONE batch. A 1000-executor production stream restarts many times over
its life, each resume compounding on state the previous incarnations
built — so the property worth soaking is that N restarts at arbitrary
depths leave the state store exactly equal to a single uninterrupted
run. This tool:

- splits events (sf0.1 by default) into 120 source files and streams
  them one file per trigger through ``running_user_totals``
  (``applyInPandasWithState`` — real state-store commits, not a
  stateless map),
- injects a RuntimeError AFTER the sink write but BEFORE the commit at
  four depths spread across the run (batches 17/43/77/101 — early,
  mid, late, very late), each firing exactly once,
- restarts with the same checkpoint after every kill until the source
  drains,
- asserts the latest emitted total per user across ALL batch emissions
  equals the whole-source batch aggregate (state applied exactly once
  per event, across 4 compounding resumes), and that all 120 batch
  ids emitted.

Run from the repo root (fresh session; prints one JSON line):

    python tools/streaming_soak.py [--files=120] [--failures=17,43,77,101]
        [--expand-users=R] [--rocksdb]

``--expand-users=R`` unions R id-shifted replicas of the source so the
state store holds R× the keys (1,500 → 150k at R=100) — the
CARDINALITY axis of the soak: exactly-once must hold and per-batch
commit time must stay flat when state stops being trivially small.
``--rocksdb`` switches the state store to the RocksDB provider (the
off-heap store a production deployment would run at millions of keys).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n_files = 120
    fail_at = {17, 43, 77, 101}
    expand_users = 1
    rocksdb = False
    for a in sys.argv[1:]:
        if a.startswith("--files="):
            n_files = int(a.split("=", 1)[1])
        elif a.startswith("--failures="):
            fail_at = {int(x) for x in a.split("=", 1)[1].split(",") if x}
        elif a.startswith("--expand-users="):
            expand_users = int(a.split("=", 1)[1])
        elif a == "--rocksdb":
            rocksdb = True

    import shutil
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryException

    from dataframe_sql_spark.session import get_spark
    from dataframe_sql_spark.sources.io import read_table
    from dataframe_sql_spark.streaming.pipeline import running_user_totals

    spark = get_spark("streaming_soak")
    spark.sparkContext.setLogLevel("ERROR")
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    root = tempfile.mkdtemp(prefix=f"stream_soak_{os.getpid()}_")
    src, out, ckpt = f"{root}/src", f"{root}/out", f"{root}/ckpt"
    flags = f"{root}/flags"
    os.makedirs(flags)
    t_start = time.perf_counter()
    try:
        events = read_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value", "ts"
        )
        if expand_users > 1:
            # R id-shifted replicas: every replica contributes a disjoint
            # user-id range, so key cardinality scales exactly R× while
            # per-key row counts stay identical to the 1× soak. Expansion
            # is a single explode (one narrow plan node) rather than an
            # R-way unionByName chain — at the million-key point (R=667)
            # a union chain is 667 plan branches, which Catalyst analyzes
            # in superlinear time and the scheduler treats as 667 scans.
            events = (
                events.withColumn(
                    "__r",
                    F.explode(F.sequence(F.lit(0), F.lit(expand_users - 1))),
                )
                .withColumn(
                    "user_id",
                    # long math: at R=667 the shift is 6.66e9, past int32
                    # (ANSI mode makes the overflow a hard error)
                    F.col("user_id").cast("long")
                    + F.col("__r").cast("long") * F.lit(10_000_000),
                )
                .drop("__r")
            )
        events.repartition(n_files).write.parquet(src)
        # one micro-batch per SOURCE FILE: count what the writer
        # actually produced rather than trusting the repartition target
        n_src_files = sum(
            1
            for p in Path(src).iterdir()
            if p.name.startswith("part-") and p.suffix == ".parquet"
        )

        batch_walls: dict[int, float] = {}

        def failing_sink(batch_df, batch_id: int) -> None:
            t = time.perf_counter()
            batch_df.withColumn("__bid", F.lit(batch_id)).write.mode(
                "overwrite"
            ).parquet(f"{out}/b{batch_id}")
            batch_walls[batch_id] = round(time.perf_counter() - t, 3)
            flag = f"{flags}/{batch_id}"
            if batch_id in fail_at and not os.path.exists(flag):
                open(flag, "w").close()
                raise RuntimeError(f"injected soak failure at batch {batch_id}")

        def run_once() -> None:
            stream = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = (
                running_user_totals(stream, timeout_minutes=0)
                .writeStream.foreachBatch(failing_sink)
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(1800)

        restarts = 0
        while True:
            try:
                run_once()
                break
            except StreamingQueryException as e:
                assert "injected soak failure" in str(e), str(e)
                restarts += 1
                assert restarts <= len(fail_at) + 1, "failure loop runaway"

        emitted = spark.read.parquet(f"{out}/b*")
        batch_ids = sorted(
            int(p.name[1:]) for p in Path(out).iterdir() if p.name.startswith("b")
        )
        latest = (
            emitted.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.desc("__bid"))
                ),
            )
            .filter("__rn = 1")
            .select(
                "user_id",
                "n_events",
                F.round("total_value", 6).alias("total_value"),
            )
        )
        # exactly-once check stays DISTRIBUTED (symmetric exceptAll +
        # counts): at the million-key point the old two-sided collect
        # pulled ~2M rows into Python dicts — the comparison must scale
        # with the state it validates, same rule as the operators.
        want = running_user_totals(events).select(
            "user_id",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
        n_got = latest.count()
        n_diff = (
            latest.exceptAll(want).count() + want.exceptAll(latest).count()
        )
        state_ok = n_diff == 0 and n_got > 0
        all_batches = batch_ids == list(range(n_src_files))
        # commit-time flatness: as state accumulates, per-batch sink wall
        # must not grow with batch index (a growing trend means the state
        # store rescans instead of doing incremental commits)
        ordered = [batch_walls[b] for b in batch_ids if b in batch_walls]
        head = ordered[1 : max(2, len(ordered) // 4)]  # skip warm-up batch 0
        tail = ordered[-max(1, len(ordered) // 4) :]
        flatness = (
            round((sum(tail) / len(tail)) / (sum(head) / len(head)), 2)
            if head and tail
            else None
        )
        print(
            json.dumps(
                {
                    "metric": "streaming_soak",
                    "micro_batches": len(batch_ids),
                    "expected_batches": n_src_files,
                    "all_batches_emitted": all_batches,
                    "injected_failures": sorted(fail_at),
                    "restarts": restarts,
                    "users": n_got,
                    "expand_users": expand_users,
                    "rocksdb": rocksdb,
                    "state_exactly_once": state_ok,
                    "commit_wall_tail_over_head": flatness,
                    "wall_sec": round(time.perf_counter() - t_start, 2),
                }
            )
        )
        return 0 if (state_ok and all_batches and restarts == len(fail_at)) else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
