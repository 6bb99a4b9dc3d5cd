"""Mechanical enforcement of the driver-window rotation claim (ADVICE r6
#4): every registry row rotated OUT of the external harness's ~50-entry
verification window must be (a) green in the previous round's driver
correctness artifact and (b) provably untouched since the tree that
artifact stamped — registered-function AST, referenced entry_queries
globals, and the transitive quality_filter import closure all identical
to the base commit.  A future round that edits an operator and forgets
to rotate it back into the window fails here, not silently in the field.

No SparkSession needed — this is pure git + ast analysis.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from window_audit import (  # noqa: E402
    EntryQueriesAudit,
    audit_tail_row,
    changed_package_files,
)

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # driver stamps this many entries (observed r3-r6)


def _entry():
    import __spark_entry__ as e

    return e


def test_tail_rows_previously_stamped_green():
    """Every tail row carries a fully-green stamp from the previous
    round's driver artifact (rows + schema + hash, no error)."""
    e = _entry()
    prev = json.loads((REPO / "CORRECTNESS_r06.json").read_text())
    for name in e._R7_TAIL:
        row = prev.get(name)
        assert row is not None, f"{name} was never stamped by the r6 driver"
        assert (
            row["rows_match"] and row["schema_match"] and row["hash_match"]
            and row["err"] is None
        ), f"{name} was stamped but not fully green: {row}"


def test_tail_rows_untouched_since_stamp():
    """The audit proves each tail row's code path is byte/AST-identical
    to the tree the previous driver stamped."""
    e = _entry()
    from quality_filter.entry_queries import QUERIES

    changed = changed_package_files(e._R7_BASE_COMMIT)
    audit = EntryQueriesAudit(e._R7_BASE_COMMIT)
    problems = {
        name: probs
        for name in e._R7_TAIL
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
    assert set(excluded) <= set(e._R7_TAIL), (
        f"rows outside the window that are not audited tail rows: "
        f"{set(excluded) - set(e._R7_TAIL)}"
    )
    assert len(e._R7_TAIL) >= n_excluded
    prev = json.loads((REPO / "CORRECTNESS_r06.json").read_text())
    never_stamped = [n for n in order if n not in prev]
    for name in never_stamped:
        assert order.index(name) < WINDOW, (
            f"never-stamped row {name} sits outside the driver window"
        )
