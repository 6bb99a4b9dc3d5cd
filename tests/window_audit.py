"""Mechanical audit of the driver-window rotation (harness policy).

The external correctness harness stamps only the first ~50 entries of
``__spark_entry__.queries()`` each round; rows rotated out ("tail") are
claimed to be *previously stamped green on code that has not changed
since*.  ADVICE r6 #4: nothing enforced that claim — a future round could
silently rotate a changed operator out of external verification.  This
module makes the claim checkable:

  For a tail query ``name`` the audit verifies, against the git tree the
  previous round's driver actually stamped (``BASE_COMMIT``):

  1. its registered function's AST in ``entry_queries.py`` is identical
     (decorators included, so the baked-in DuckDB oracle SQL expression
     is covered), and so is every module-level helper/constant the
     function transitively references within ``entry_queries.py``;
  2. every ``quality_filter`` module in the function's transitive import
     closure (local ``from quality_filter.x import ...`` statements plus
     the module-level imports its referenced globals come from, followed
     recursively) is byte-identical to the stamped tree.

AST equality (``ast.dump``) ignores comments/formatting, so comment-only
touches don't force a row back into the window, while any semantic edit
does.  The closure walk is conservative: it follows *every* import in a
visited module, not just the names used.
"""

from __future__ import annotations

import ast
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "quality_filter"


class BaseCommitUnavailable(RuntimeError):
    """The audit base commit is absent from local git history (shallow or
    truncated checkout) — tail enforcement cannot run here.  Callers
    should surface this distinctly (the pytest suite skips with the
    message) rather than erroring as if the tail claim failed.
    ADVICE r7 #5: base commits are full 40-char hashes so a short prefix
    can never go ambiguous as history grows."""


def require_commit(commit: str) -> None:
    """Raise BaseCommitUnavailable unless ``commit`` resolves locally."""
    probe = subprocess.run(
        ["git", "cat-file", "-e", f"{commit}^{{commit}}"],
        cwd=REPO, capture_output=True, text=True,
    )
    if probe.returncode != 0:
        raise BaseCommitUnavailable(
            f"audit base commit {commit} is not in local history "
            f"(shallow/truncated checkout?): {probe.stderr.strip()}"
        )


def git_show(commit: str, relpath: str) -> str:
    require_commit(commit)
    return subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout


def changed_package_files(base_commit: str) -> set[str]:
    """``quality_filter/*.py`` paths whose worktree content differs from
    ``base_commit`` (committed, staged, and unstaged edits alike)."""
    require_commit(base_commit)
    out = subprocess.run(
        ["git", "diff", "--name-only", base_commit, "--", f"{PKG}/"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return {ln for ln in out.splitlines() if ln.endswith(".py")}


def _toplevel_nodes(tree: ast.Module) -> dict[str, ast.AST]:
    """name -> defining top-level node (defs, classes, assigns, imports)."""
    byname: dict[str, ast.AST] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            byname[node.name] = node
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    byname[tgt.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            byname[node.target.id] = node
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                byname[alias.asname or alias.name] = node
        elif isinstance(node, ast.Import):
            for alias in node.names:
                byname[(alias.asname or alias.name).split(".")[0]] = node
    return byname


def _pkg_modules_of_import(node: ast.AST) -> set[str]:
    mods: set[str] = set()
    if isinstance(node, ast.ImportFrom) and node.module:
        parts = node.module.split(".")
        if parts[0] == PKG:
            mods.add(parts[1] if len(parts) > 1 else "__init__")
    elif isinstance(node, ast.Import):
        for alias in node.names:
            parts = alias.name.split(".")
            if parts[0] == PKG:
                mods.add(parts[1] if len(parts) > 1 else "__init__")
    return mods


def _referenced_names(node: ast.AST) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def module_import_closure(mod: str, seen: set[str] | None = None) -> set[str]:
    """All quality_filter modules reachable from ``quality_filter/<mod>.py``
    by following every import statement (any nesting level)."""
    seen = set() if seen is None else seen
    if mod in seen:
        return seen
    seen.add(mod)
    path = REPO / PKG / f"{mod}.py"
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        for nxt in _pkg_modules_of_import(node):
            module_import_closure(nxt, seen)
    return seen


# Registry plumbing, not operator code: every query's decorator references
# _register, so an infra edit there (e.g. the r7 duplicate-name guard) would
# otherwise mark all 73 rows "touched" and make rotation impossible.  Its
# behavior is re-verified every round for EVERY entry by the pytest oracle
# contract (tests/test_entry_contract.py), independent of window position.
_INFRA = {"_register"}


class EntryQueriesAudit:
    """Compares the current ``entry_queries.py`` against ``base_commit``'s
    version at per-top-level-name grain."""

    def __init__(self, base_commit: str):
        rel = f"{PKG}/entry_queries.py"
        self.old = ast.parse(git_show(base_commit, rel))
        self.new = ast.parse((REPO / rel).read_text())
        self.old_names = _toplevel_nodes(self.old)
        self.new_names = _toplevel_nodes(self.new)

    def unchanged_closure_report(self, func_name: str) -> tuple[list[str], set[str]]:
        """Walk ``func_name``'s reference closure inside entry_queries.py.

        Returns ``(changed_names, pkg_modules)``: top-level names whose
        defining AST differs from the base tree (empty == untouched), and
        the quality_filter modules imported anywhere along the walk.
        """
        changed: list[str] = []
        pkg_mods: set[str] = set()
        visited: set[str] = set()
        frontier = [func_name]
        while frontier:
            name = frontier.pop()
            if name in visited or name in _INFRA:
                continue
            visited.add(name)
            new_node = self.new_names.get(name)
            if new_node is None:  # builtin / local — nothing to compare
                continue
            old_node = self.old_names.get(name)
            if old_node is None or ast.dump(old_node) != ast.dump(new_node):
                changed.append(name)
                continue
            pkg_mods |= _pkg_modules_of_import(new_node)
            for sub in ast.walk(new_node):
                pkg_mods |= _pkg_modules_of_import(sub)
            frontier.extend(_referenced_names(new_node) - visited)
        return sorted(changed), pkg_mods


def audit_tail_row(
    audit: EntryQueriesAudit, func_name: str, changed_files: set[str]
) -> list[str]:
    """All reasons ``func_name`` is NOT eligible for the tail (empty ==
    eligible): changed entry_queries-level definitions it references, or
    changed quality_filter modules in its transitive import closure."""
    problems: list[str] = []
    changed_names, pkg_mods = audit.unchanged_closure_report(func_name)
    problems += [f"entry_queries definition changed: {n}" for n in changed_names]
    closure: set[str] = set()
    for mod in pkg_mods:
        if mod != "entry_queries":
            module_import_closure(mod, closure)
    for mod in sorted(closure):
        if f"{PKG}/{mod}.py" in changed_files:
            problems.append(f"imports changed module: {PKG}/{mod}.py")
    return problems


def _suggest(base_commit: str, correctness_artifact: str) -> None:
    """Print the tail-eligible rows for the NEXT rotation: previously
    green in ``correctness_artifact`` AND provably untouched vs
    ``base_commit``.  Usage:

        python tests/window_audit.py 0e341f0 CORRECTNESS_r06.json
    """
    import json
    import sys

    sys.path.insert(0, str(REPO))
    from quality_filter.entry_queries import QUERIES

    green = [
        name
        for name, row in json.loads(
            (REPO / correctness_artifact).read_text()
        ).items()
        if row.get("rows_match") and row.get("schema_match")
        and row.get("hash_match") and row.get("err") is None
    ]
    changed = changed_package_files(base_commit)
    audit = EntryQueriesAudit(base_commit)
    eligible, touched = [], {}
    for name in green:
        probs = audit_tail_row(audit, QUERIES[name].__name__, changed)
        (eligible.append(name) if not probs else touched.__setitem__(name, probs))
    print(f"changed files vs {base_commit}: {sorted(changed)}")
    print(f"\n{len(eligible)} tail-eligible rows:")
    for n in eligible:
        print(f"  {n!r},")
    print(f"\n{len(touched)} touched rows (must stay in window):")
    for n, probs in touched.items():
        print(f"  {n}: {probs[0]}")


if __name__ == "__main__":
    import sys as _sys

    _suggest(_sys.argv[1], _sys.argv[2])
