"""Estimator-blindness audit: find corpus-scaled broadcasts the
planner picks at scaled-up stats (SCALE.md round-11 frontier item 1,
delivered round 10).

The round-10 dd_prefix_pairs failure generalizes: Catalyst's size
estimator cannot see explode/groupBy fan-out, so a join side that
SCALES WITH THE CORPUS can stay under the broadcast threshold in the
estimate while being gigabytes in reality — invisible at small SF,
fatal (TaskResultLost / driver OOM) once memory is tight. This tool
builds the PLAN (no execution) of every documents/embeddings-axis
catalog entry against a 10× parquet expansion and reports each
BroadcastExchange whose subtree contains a Generate (explode) or a
raw documents/embeddings file scan — the two textual signatures of a
corpus-scaled side.

Hits are candidates, not verdicts: a broadcast over a scan capped by
Limit/TakeOrdered, reduced to a B-bounded key space by an aggregate,
or filtered to a constant-size config is bounded BY DESIGN and fine.
The tool prints the evidence (subtree snippet) so each hit can be
adjudicated in SCALE.md; the goal state is zero UNadjudicated hits.

Run from the repo root (expect a few minutes — some entries train
models at plan-build time):

    python tools/broadcast_audit.py [--scale=10] [name_filter ...]

Prints one line per hit and a final JSON summary.
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# documents/embeddings-axis entries (the corpus side); tpch entries
# join fact tables whose scan estimates are honest (file-based), so
# the blindness class doesn't apply the same way there.
DEFAULT_PREFIXES = ("dd_", "txt_", "emb_", "sim_", "x_", "pipe_", "mm_")

# Adjudicated-OK broadcasts (round 10): entries whose remaining hits
# are bounded BY DESIGN, not by estimate. dd_incremental*: the
# broadcast side is the incremental BATCH's banded keys — in
# production that is the delta, bounded by batch sizing policy, and
# broadcasting it against the big history index is exactly the
# intended plan (the docstring says so). dd_fuzzy_decontaminate /
# pipe_dedup_funnel: the flagged sides are thin scalar projections
# (doc_id + bool / bare vec_id, ≤9-byte rows) whose width the
# estimator sees HONESTLY — at real scale the row count pushes the
# estimate over the threshold and AQE/static planning flips to SMJ on
# its own; hinting would just slow the small case. Every OTHER hit
# class (array-carrying corpus sides — width-blind via
# ArrayType.defaultSize) is fixed with merge hints at the operator
# sites; see SCALE.md round-10.
ADJUDICATED_OK = {
    "dd_incremental",
    "dd_incremental_verified",
    "dd_fuzzy_decontaminate",
    "pipe_dedup_funnel",
}

# plan-build for these RUNS heavy jobs (training/iteration) at the
# scaled size — minutes each at 10×; skip unless explicitly named.
SKIP_HEAVY_BUILDERS = {
    "sim_ann_pq",
    "sim_ann_pq_verified",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_verified",
    "txt_bpe_tokens",
    "txt_bpe_roundtrip",
    "dd_clusters",
    "dd_clusters_verified",
    "x_pagerank",
}


def _subtrees(plan: str, marker: str):
    """Yield (line_index, subtree_text) for each `marker` node, using
    the toString tree's indentation to find the subtree extent."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if marker not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-*"))
        block = [line]
        for nxt in lines[i + 1 :]:
            nindent = len(nxt) - len(nxt.lstrip(" :+-*"))
            if nxt.strip() and nindent <= indent:
                break
            block.append(nxt)
        yield i, "\n".join(block)


def main() -> int:
    scale = 10
    filters: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            scale = int(a.split("=", 1)[1])
        else:
            filters.append(a)

    from dataframe_sql_spark.session import get_spark

    import bench

    spark = get_spark("broadcast_audit")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    d = bench._write_scaled_dir(spark, "/root/testdata/sf0.1", scale, "docs")
    hits: list[dict] = []
    built = skipped = errors = 0
    try:
        import __spark_entry__ as entrymod

        for name, fn in entrymod.queries().items():
            if filters:
                if not any(f in name for f in filters):
                    continue
            elif not name.startswith(DEFAULT_PREFIXES):
                continue
            if name in SKIP_HEAVY_BUILDERS and not filters:
                skipped += 1
                continue
            try:
                df = fn(spark, d)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:
                errors += 1
                print(f"BUILD_ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
                continue
            built += 1
            for _, sub in _subtrees(plan, "BroadcastExchange"):
                corpus_scan = re.search(
                    r"FileScan parquet .*(documents|embeddings)", sub
                )
                has_explode = "Generate explode" in sub
                if not (corpus_scan or has_explode):
                    continue
                # An aggregate or limit anywhere between the broadcast
                # and the scan bounds the broadcast volume by key
                # cardinality / k, not corpus bytes — the
                # broadcast_attach totals, B-bounded score tables and
                # capped vocab lists all look like this. A broadcast
                # whose subtree reaches the corpus scan (or an explode)
                # through ONLY row-preserving ops is the prefix_pairs
                # class: its size IS the corpus.
                reduced = bool(
                    re.search(
                        r"HashAggregate|ObjectHashAggregate|SortAggregate"
                        r"|TakeOrderedAndProject|GlobalLimit|CollectLimit"
                        r"|Deduplicate",
                        sub,
                    )
                )
                if reduced:
                    continue
                hits.append(
                    {
                        "entry": name,
                        "explode_in_subtree": has_explode,
                        "corpus_scan": bool(corpus_scan),
                        "snippet": " | ".join(
                            l.strip()[:70] for l in sub.splitlines()[:4]
                        ),
                    }
                )
                print(
                    f"HIT {name}: explode={has_explode} "
                    f"corpus_scan={bool(corpus_scan)}"
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "broadcast_audit",
                "scale": scale,
                "entries_built": built,
                "skipped_heavy": skipped,
                "build_errors": errors,
                "raw_corpus_broadcasts": len(hits),
                "unadjudicated": sorted(
                    {h["entry"] for h in hits} - ADJUDICATED_OK
                ),
                "hit_entries": sorted({h["entry"] for h in hits}),
                "hit_details": hits[:30],
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
