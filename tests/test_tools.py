"""Gate-machinery self-tests (round-11 oracle-red probe).

Every correctness gate in this repo had only ever CONFIRMED green —
the failure direction was untested, so a broken comparator could have
been silently passing everything. Round 11 probed the live path by
deliberately flipping a rounding mode (6 → 5 digits in
bigram_lm_scores) and observing `check_oracle --vanilla --strict` go
red with a values-differ sample (recorded in SCALE.md), then reverted.
These tests pin the pure parsing/ranking pieces of that machinery so
the red path stays covered without re-breaking an operator.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.sf1_sweep import parse_check_output  # noqa: E402


GREEN_OUT = "PASS a_one (5 rows)\nSKIP b_two (oracle_max_sf)\nPASS c_three (9 rows)\nALL GREEN\n"
RED_OUT = (
    "PASS a_one (5 rows)\n"
    "FAIL c_three: values differ; sample diff: [(('-3.3', '1'), 1)]\n"
    "1 FAILURES\n"
)


def test_sweep_parse_green():
    res = parse_check_output(GREEN_OUT, 0)
    assert res["all_green"] and res["pass"] == 2 and res["fail"] == 0
    assert res["skipped_infeasible_oracle"] == 1


def test_sweep_parse_red_fails_the_axis():
    res = parse_check_output(RED_OUT, 1)
    assert not res["all_green"]
    assert res["fail"] == 1 and res["fail_names"] == ["c_three"]


def test_sweep_parse_zero_pass_is_not_green():
    # an axis that ran nothing (bad filter, crashed subprocess) must
    # not read as green — the round-10 substring-filter bug would have
    # been caught by this had filters filtered everything out
    res = parse_check_output("", 0)
    assert not res["all_green"]


def test_sweep_parse_crash_before_compare_is_red():
    # subprocess died mid-run (e.g. OOM): some PASSes then nonzero exit
    res = parse_check_output("PASS a_one (5 rows)\n", 137)
    assert not res["all_green"]


def test_sweep_axes_disjoint_and_total():
    from tools.sf1_sweep import axis_entries

    t, d = axis_entries("tpch"), axis_entries("docs")
    assert not set(t) & set(d)
    assert len(t) > 100 and len(d) > 50


def test_ledger_certificate_coverage_closed_under_growth():
    # Same-commit certificate policy as a SUITE gate: build_table()
    # asserts every rows-only catalog entry maps to a certificate that
    # is itself an oracled (hash-checkable) catalog entry. Running it
    # here means a commit that adds a rows-only entry without its
    # certificate (or removes/downgrades a cited certificate) fails the
    # suite in that same commit — the ledger tool no longer has to be
    # invoked manually for the policy to bind.
    from tools.attestation_ledger import build_table

    table = build_table()
    assert "| `dd_minhash` | rows-only |" in table


def test_ledger_rows_only_rows_count_green():
    # the round-10 advisor bug: rows-only driver rows (err='no_oracle',
    # real spark_rows) must count as attestations or they would be
    # pinned into every proposed window forever
    from tools.attestation_ledger import _row_green

    assert _row_green(
        {"err": "no_oracle", "spark_rows": 476, "rows_match": None}
    )
    assert not _row_green({"err": "no_oracle", "spark_rows": None})
    assert _row_green(
        {
            "err": None,
            "rows_match": True,
            "hash_match": True,
            "schema_match": True,
        }
    )
    assert not _row_green(
        {"err": None, "rows_match": True, "hash_match": False}
    )
    assert not _row_green({"err": "boom", "rows_match": None})
