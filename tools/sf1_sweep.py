"""sf1-scale correctness sweep (SCALE.md round-9 frontier item 1,
delivered round 10).

The driver's oracle gate has only ever run at sf ≤ 0.1. This tool
re-runs the SAME differential gate (tools/check_oracle.py, strict +
vanilla-session — the driver-faithful compare) at a 10× parquet
expansion of sf0.1 — i.e. sf1-equivalent row counts: 6M lineitem /
1.5M orders on the TPC-H axis, 50k documents / 50k embeddings on the
corpus axis — so cross-engine divergences that only appear with more
data (float accumulation order, overflow past int32/decimal bounds,
group cardinality edges) get a chance to show before a real deploy.

Corpus-quadratic oracles self-exclude: each carries a declarative
``oracle_max_sf`` on its QuerySpec (the SPARK side scales — the
DuckDB complete-pair-set / brute-force oracle is the bounded part),
so check_oracle auto-skips them with the reason printed, keeping this
sweep hand-list-free.

Run from the repo root on an idle host (expect ~30-60 min total):

    python tools/sf1_sweep.py [--axis=tpch|docs|both]

Prints one summary JSON line per axis; exit 0 iff every compared
entry is green on every axis run.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Entry-name PREFIXES per axis: the axis's scaled tables are the ones
# its entries actually stress (everything else in the dir is a 1x
# symlink, which would make the run a slower repeat of the sf0.1 gate).
# These are anchored — axis_entries() expands them against the catalog
# with str.startswith and passes the resulting EXACT list to
# check_oracle --names=, because check_oracle's positional filters
# substring-match ('d_' would match every dd_* entry, 'p_' would match
# pipe_*, re-running most of the docs axis against 1x symlinks).
AXIS_PREFIXES = {
    "tpch": [
        "tpch_", "p_", "d_", "j_", "a_", "w_", "o_", "u_", "q_",
        "f_", "g_", "ts_", "st_", "x_sessionize", "x_funnel",
        "x_sorted_neighborhood", "x_pagerank",
        # x_* whose oracle reads events/lineitem/orders/customer
        "x_cohort_retention", "x_grouped_agg_udaf", "x_grouped_map",
        "x_pivot", "x_record_linkage", "x_scd2_intervals",
        "x_skew_report", "x_topk_per_group", "x_topk_with_ties",
        "x_unpivot",
    ],
    "docs": [
        "dd_", "txt_", "emb_", "sim_", "mm_", "pipe_", "x_dsir",
        "x_quality", "x_dataset_mix", "x_split_decontaminate",
        "x_source_cap", "x_pack_sequences",
        # x_* whose oracle reads documents/embeddings
        "x_bottomk_sample", "x_curriculum_order", "x_file_metadata",
        "x_global_shuffle", "x_hash_sample", "x_hash_split",
        "x_negative_pairs", "x_profile", "x_score_calibration",
        "x_snapshot_diff", "x_stratified_sample", "x_temperature_mix",
        "x_weighted_sample", "x_winsorize",
    ],
}


def _phys_mb() -> int:
    try:
        return os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") // (1 << 20)
    except (ValueError, OSError, AttributeError):
        return 24 * 1024


def axis_entries(axis: str) -> list[str]:
    """Exact catalog entry names whose name starts with one of the
    axis's anchored prefixes. Asserts the two axes stay disjoint so a
    new entry can't silently run on the wrong axis's scaled tables."""
    from dataframe_sql_spark import registry

    names = registry._ordered_names()
    picked = [
        n for n in names
        if any(n.startswith(p) for p in AXIS_PREFIXES[axis])
    ]
    other = "docs" if axis == "tpch" else "tpch"
    overlap = {
        n for n in picked
        if any(n.startswith(p) for p in AXIS_PREFIXES[other])
    }
    assert not overlap, f"entries on both axes: {sorted(overlap)}"
    # total coverage: a NEW catalog entry must be assigned to exactly
    # one axis here, or it would silently never run at sf1 scale
    neither = {
        n for n in names
        if not any(
            n.startswith(p) for ax in AXIS_PREFIXES.values() for p in ax
        )
    }
    assert not neither, f"catalog entries on neither sweep axis: {sorted(neither)}"
    return picked


def build_dir(axis: str, factor: int = 10) -> str:
    """Write the ``factor``× expansion as parquet under a dir whose
    basename carries the resulting sf (factor 10 → 'sf1', 100 →
    'sf10') so check_oracle parses the right sf — that is what arms
    the oracle_max_sf auto-skips."""
    from dataframe_sql_spark.session import get_spark

    import bench

    spark = get_spark(f"sf1_sweep_build_{axis}")
    spark.sparkContext.setLogLevel("ERROR")
    kind = "tpch" if axis == "tpch" else "docs"
    raw = bench._write_scaled_dir(spark, "/root/testdata/sf0.1", factor, kind)
    sf_name = f"sf{0.1 * factor:g}"
    dst = os.path.join(
        os.path.dirname(raw), f"{sf_name}_{axis}_{os.getpid()}", sf_name
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    os.rename(raw, dst)  # symlinks inside are absolute, they survive
    return dst


def run_axis(axis: str, factor: int = 10) -> dict:
    t0 = time.perf_counter()
    d = build_dir(axis, factor)
    try:
        # the 10x axes fit in 2h; larger decades scale the wall
        # MULTIPLICATIVELY (tpch took 3288s at 10x and the
        # linear-oracle subset dominates, so ~720s/decade-unit is the
        # observed slope with headroom) — an additive formula gave
        # factor=100 tpch no chance of finishing inside its wall.
        wall = 7200 if factor <= 10 else 720 * factor
        # child output streams to a tailable file instead of a pipe:
        # a multi-hour 100× axis with capture_output is a black box
        # (pipe-buffered until exit), and an operator can't tell a
        # slow entry from a hang. `python -u` keeps the child's PASS/
        # FAIL lines unbuffered so `tail -f` shows live progress.
        logp = Path(tempfile.gettempdir()) / (
            f"sf1_sweep_{axis}_{factor}x_{os.getpid()}.log"
        )
        print(f"# {axis} axis: progress -> {logp}", file=sys.stderr, flush=True)
        try:
            with open(logp, "w") as lf:
                proc_rc = subprocess.run(
                    [
                        sys.executable,
                        "-u",
                        "tools/check_oracle.py",
                        "--vanilla",
                        "--strict",
                        # a 6M-row axis on 32 local threads OOMs the 1g
                        # default heap regardless of plan shape; memory
                        # is an environment axis, sized like a real
                        # deploy would
                        "--driver-memory=8g",
                        # beyond-driver-SF oracles (sim_ann_ivfpq_verified's
                        # corpus×dim replay CTEs) need more than the gate's
                        # conservative 24 GB default: size the oracle like
                        # the sweep sizes the driver — 65% of the box, no
                        # fixed cap (r14: the 24 GB default OOM'd an entry
                        # that had been sf1-green under the old 80% limit)
                        f"--duckdb-mem={int(_phys_mb() * 0.65)}",
                        f"--names={','.join(axis_entries(axis))}",
                        d,
                    ],
                    stdout=lf,
                    stderr=subprocess.STDOUT,
                    timeout=wall,
                ).returncode
        except subprocess.TimeoutExpired:
            # fold a wall overrun into a red verdict instead of a
            # traceback: partial PASS/FAIL lines are still parsed so
            # the operator sees how far the run got before the wall
            res = parse_check_output(
                logp.read_text(errors="replace"), returncode=124
            )
            res["all_green"] = False
            res["timeout_sec"] = wall
            res.update(
                {
                    "metric": "sf1_sweep",
                    "axis": axis,
                    "factor": factor,
                    "sf": round(0.1 * factor, 4),
                    "dir": d,
                    "wall_sec": round(time.perf_counter() - t0, 1),
                }
            )
            return res
        res = parse_check_output(logp.read_text(errors="replace"), proc_rc)
        res.update(
            {
                "metric": "sf1_sweep",
                "axis": axis,
                "factor": factor,
                "sf": round(0.1 * factor, 4),
                "dir": d,
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
        return res
    finally:
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)


def parse_check_output(stdout: str, returncode: int) -> dict:
    """Fold a check_oracle run into the sweep's verdict fields.
    Extracted so the red path is unit-testable (round-11 oracle-red
    probe: a gate that has only ever confirmed green is itself
    unverified) — see tests/test_tools.py."""
    out = stdout.replace("\r", "\n")
    passes = len(re.findall(r"^PASS ", out, re.M))
    fails = re.findall(r"^FAIL .*$", out, re.M)
    skips = len(re.findall(r"^SKIP ", out, re.M))
    return {
        "pass": passes,
        "fail": len(fails),
        "fail_names": [f.split(" ")[1].rstrip(":") for f in fails][:20],
        "skipped_infeasible_oracle": skips,
        "all_green": returncode == 0 and not fails and passes > 0,
    }


def main() -> int:
    axis = "both"
    factor = 10
    for a in sys.argv[1:]:
        if a.startswith("--axis="):
            axis = a.split("=", 1)[1]
        elif a.startswith("--factor="):
            # e.g. --factor=100 --axis=docs = the 500k-docs decade:
            # sf10-equivalent on the corpus axis, linear-oracle entries
            # only (quadratic oracles self-exclude via oracle_max_sf)
            factor = int(a.split("=", 1)[1])
    axes = ["tpch", "docs"] if axis == "both" else [axis]
    ok = True
    for ax in axes:
        res = run_axis(ax, factor)
        print(json.dumps(res), flush=True)
        ok = ok and res["all_green"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
