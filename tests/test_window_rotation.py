"""Mechanical enforcement of the driver-window rotation claim (ADVICE r6
#4): every registry row rotated OUT of the external harness's ~50-entry
verification window must be (a) fully green in the most recent driver
correctness artifact that stamped it and (b) EITHER provably untouched
since the tree the r8 driver stamped — registered-function AST,
referenced entry_queries globals, and the transitive quality_filter
import closure all identical to the base commit — OR (round 9, where the
shared scan-spread/lambda-hoist work touched 72 of 79 rows' transitive
paths) re-verified on this round's final tree against the DuckDB oracle
by exact sorted-row comparison at every sweep scale factor, with the
committed artifact BENCH/r9_oracle_sweep.json as evidence.  A future
round that edits an operator and forgets to rotate it back into the
window (or to re-sweep it) fails here, not silently in the field.

No SparkSession needed — this is pure git + ast + artifact analysis.  In
a shallow or history-truncated checkout the base commit may be absent;
the audit raises BaseCommitUnavailable and those tests SKIP with that
message instead of erroring as if the tail claim failed (ADVICE r7 #5).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from window_audit import (  # noqa: E402
    BaseCommitUnavailable,
    EntryQueriesAudit,
    audit_tail_row,
    changed_package_files,
)

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # driver stamps this many entries (observed r3-r8)
SWEEP_ARTIFACT = "BENCH/r9_oracle_sweep.json"


def _entry():
    import __spark_entry__ as e

    return e


def _latest_stamp(name: str) -> dict | None:
    """The row's stamp from the most recent round that carried it."""
    for art in sorted(REPO.glob("CORRECTNESS_r*.json"), reverse=True):
        rows = json.loads(art.read_text())
        if name in rows:
            return rows[name]
    return None


def _sweep() -> dict:
    path = REPO / SWEEP_ARTIFACT
    assert path.exists(), (
        f"{SWEEP_ARTIFACT} missing: regenerate with "
        "`python scripts/check_oracle.py --queries all --json-out "
        "BENCH/r9_oracle_sweep.json --sf <each sf dir>` on the final tree"
    )
    return json.loads(path.read_text())


def test_tail_rows_previously_stamped_green():
    """Every tail row carries a fully-green stamp from some prior
    driver round (rows + schema + hash, no error)."""
    e = _entry()
    for name in e._R9_TAIL:
        row = _latest_stamp(name)
        assert row is not None, f"{name} was never stamped by any driver round"
        assert (
            row["rows_match"] and row["schema_match"] and row["hash_match"]
            and row["err"] is None
        ), f"{name} was stamped but not fully green: {row}"


def test_tail_rows_untouched_or_swept():
    """Each tail row is byte/AST-identical to the r8-stamped tree, or —
    when its audit flag comes from the round-9 shared-helper work — it is
    green in the committed 3-SF exact-row oracle sweep of this tree."""
    e = _entry()
    from quality_filter.entry_queries import QUERIES

    try:
        changed = changed_package_files(e._R9_BASE_COMMIT)
        audit = EntryQueriesAudit(e._R9_BASE_COMMIT)
    except BaseCommitUnavailable as exc:
        pytest.skip(str(exc))
    touched = {
        name: probs
        for name in e._R9_TAIL
        if (probs := audit_tail_row(audit, QUERIES[name].__name__, changed))
    }
    if not touched:
        return
    sweep = _sweep()
    assert len(sweep) >= 3, f"sweep artifact covers too few SFs: {list(sweep)}"
    problems = {}
    for name in touched:
        for sf, block in sweep.items():
            row = block["results"].get(name)
            if row is None or not row["ok"]:
                problems[name] = (sf, row, touched[name])
    assert not problems, (
        "touched tail rows missing a green 3-SF sweep on this tree — "
        f"rotate them into the window or re-sweep: {problems}"
    )


def test_sweep_artifact_matches_head_commit_lineage():
    """The sweep artifact must have been produced from this repo's
    lineage (a commit that is an ancestor of HEAD or HEAD itself), so a
    stale artifact from an unrelated tree cannot vouch for tail rows."""
    import subprocess

    sweep = _sweep()
    for sf, block in sweep.items():
        commit = block["tree_commit"]
        r = subprocess.run(
            ["git", "cat-file", "-e", commit], cwd=REPO, capture_output=True
        )
        assert r.returncode == 0, f"sweep sf{sf} commit {commit} not in repo"


def test_window_covers_everything_not_in_tail():
    """head + mid fit the stamp window, tail is exactly the overflow, and
    never-stamped (new) rows sit in the head."""
    e = _entry()
    order = list(e.queries())
    assert len(order) == len(set(order))
    n_excluded = max(0, len(order) - WINDOW)
    excluded = order[WINDOW:]
    assert set(excluded) <= set(e._R9_TAIL), (
        f"rows outside the window that are not audited tail rows: "
        f"{set(excluded) - set(e._R9_TAIL)}"
    )
    assert len(e._R9_TAIL) >= n_excluded
    # never-stamped = green in NO prior round's artifact (not just the
    # last one — a row stamped in r7 but rotated out in r8 is fine)
    stamped: set[str] = set()
    for art in sorted(REPO.glob("CORRECTNESS_r*.json")):
        stamped |= set(json.loads(art.read_text()))
    never_stamped = [n for n in order if n not in stamped]
    for name in never_stamped:
        assert order.index(name) < WINDOW, (
            f"never-stamped row {name} sits outside the driver window"
        )
