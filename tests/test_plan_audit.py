"""Physical-plan regression gate (round-4 verdict order #2).

tools/explain_audit.py's ~36 .explain-based assertions — column pruning,
predicate pushdown, broadcast-join selection, no-cartesian invariants,
bytes-column pruning, shuffle counts, codegen coverage — used to be a
manually-run CLI only, so a plan regression (e.g. a broadcast threshold
change turning the catalog join sort-merge) could pass CI green.  This
test runs the same audits inside `pytest tests/` (same motion that moved
the oracle gate in-tree in round 4, tests/test_oracle_gate.py).

Reference analog: SURVEY.md §4 documents the physical-execution
expectations these audits pin.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from explain_audit import run_audits  # noqa: E402


def test_all_plan_audits_pass(spark):
    results = run_audits(spark)
    assert len(results) >= 36, f"audit list shrank: {len(results)}"
    failures = [(n, d) for n, ok, d in results if not ok]
    assert not failures, "plan regressions: " + "; ".join(
        f"{n} [{d}]" for n, d in failures
    )
