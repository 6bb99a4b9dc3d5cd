"""Mechanical enforcement of the driver-window rotation claim (ADVICE r6
#4): every registry row rotated OUT of the external harness's ~50-entry
verification window must be (a) green in the previous round's driver
correctness artifact and (b) provably untouched since the tree that
artifact stamped — registered-function AST, referenced entry_queries
globals, and the transitive quality_filter import closure all identical
to the base commit.  A future round that edits an operator and forgets
to rotate it back into the window fails here, not silently in the field.

No SparkSession needed — this is pure git + ast analysis.  In a shallow
or history-truncated checkout the base commit may be absent; the audit
raises BaseCommitUnavailable and these tests SKIP with that message
instead of erroring as if the tail claim failed (ADVICE r7 #5).
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
WINDOW = 50  # driver stamps this many entries (observed r3-r7)
PREV_ARTIFACT = "CORRECTNESS_r07.json"


def _entry():
    import __spark_entry__ as e

    return e


def test_tail_rows_previously_stamped_green():
    """Every tail row carries a fully-green stamp from the round whose
    tree the audit base commit pins (rows + schema + hash, no error)."""
    e = _entry()
    prev = json.loads((REPO / PREV_ARTIFACT).read_text())
    for name in e._R8_TAIL:
        row = prev.get(name)
        assert row is not None, f"{name} was never stamped by the r7 driver"
        assert (
            row["rows_match"] and row["schema_match"] and row["hash_match"]
            and row["err"] is None
        ), f"{name} was stamped but not fully green: {row}"


def test_tail_rows_untouched_since_stamp():
    """The audit proves each tail row's code path is byte/AST-identical
    to the tree the previous driver stamped."""
    e = _entry()
    from quality_filter.entry_queries import QUERIES

    try:
        changed = changed_package_files(e._R8_BASE_COMMIT)
        audit = EntryQueriesAudit(e._R8_BASE_COMMIT)
    except BaseCommitUnavailable as exc:
        pytest.skip(str(exc))
    problems = {
        name: probs
        for name in e._R8_TAIL
        if (probs := audit_tail_row(audit, QUERIES[name].__name__, changed))
    }
    assert not problems, (
        "tail rows outside the driver window have touched code paths — "
        f"rotate them back in: {problems}"
    )


def test_window_covers_everything_not_in_tail():
    """head + mid fit the stamp window, tail is exactly the overflow, and
    never-stamped (new) rows sit in the head."""
    e = _entry()
    order = list(e.queries())
    assert len(order) == len(set(order))
    n_excluded = max(0, len(order) - WINDOW)
    excluded = order[WINDOW:]
    assert set(excluded) <= set(e._R8_TAIL), (
        f"rows outside the window that are not audited tail rows: "
        f"{set(excluded) - set(e._R8_TAIL)}"
    )
    assert len(e._R8_TAIL) >= n_excluded
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
