"""Derive _CHURNED_THIS_ROUND candidates from the round's git diff
(round-6 verdict "What's wrong #1": the hand-kept churn list twice
missed queries whose operator code actually changed).

Usage:
    python tools/churn_suggest.py [BASE_REF]

BASE_REF defaults to the last driver round-boundary commit (message
"round N: ..."). The tool maps every changed line to registered
queries two ways:

- space_spark module files: a query is affected if its function source
  references the changed module (static import/attribute scan);
- __spark_entry__.py: changed line ranges are mapped to the enclosing
  top-level function via ast, so only queries whose own body (or whose
  oracle-SQL helper) changed are flagged.

For each affected query it prints the last round it was green and
whether the rotation already places it inside the 50-entry gate window
(no churn slot needed) or not (add it to _CHURNED_THIS_ROUND). Purely
advisory — the rotation tests enforce quota and window membership."""

from __future__ import annotations

import ast
import inspect
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def round_boundary() -> str:
    out = sh("git", "log", "--grep", r"^round [0-9]*:", "-E", "-1",
             "--format=%H")
    if not out.strip():
        raise SystemExit("no 'round N:' boundary commit found; pass a ref")
    return out.strip()


def changed_files(base: str) -> set:
    files = set(sh("git", "diff", "--name-only", f"{base}..HEAD").split())
    files |= set(sh("git", "diff", "--name-only").split())  # unstaged
    files |= set(sh("git", "diff", "--cached", "--name-only").split())
    return {f for f in files if f.endswith(".py")}


def changed_functions(base: str, relpath: str) -> set:
    """Top-level functions/classes of one file overlapping any changed
    line range (committed since base + working tree), plus everything in
    the file that transitively references a changed definition (a query
    can hit changed code through a module-local helper chain)."""
    path = os.path.join(REPO, relpath)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        tree = ast.parse(f.read())
    spans = {
        node.name: (node.lineno, node.end_lineno)
        for node in tree.body
        if isinstance(node,
                      (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
    }
    changed = set()
    for diff_args in (("git", "diff", "-U0", f"{base}..HEAD", "--",
                       relpath),
                      ("git", "diff", "-U0", "--", relpath),
                      ("git", "diff", "-U0", "--cached", "--", relpath)):
        for m in re.finditer(r"^@@ .* \+(\d+)(?:,(\d+))? @@",
                             sh(*diff_args), re.M):
            lo = int(m.group(1))
            hi = lo + (int(m.group(2)) if m.group(2) else 1)
            for name, (a, b) in spans.items():
                if lo <= b and hi >= a:
                    changed.add(name)
    # Fixpoint closure over module-local references: if A's body names a
    # changed B, A is changed too.
    refs = {}
    for node in tree.body:
        if isinstance(node,
                      (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = {n.id for n in ast.walk(node)
                     if isinstance(n, ast.Name)}
            refs[node.name] = names & set(spans)
    while True:
        grew = {a for a, deps in refs.items()
                if a not in changed and deps & changed}
        if not grew:
            return changed
        changed |= grew


def query_modules(fn) -> set:
    """Modules whose code the query actually executes: every
    `from space_spark... import X` is resolved to X's DEFINING module
    (so `from space_spark import Dataset` maps to core.dataset, not the
    package root — a root match would flag every query for any change)."""
    import importlib

    try:
        src = inspect.getsource(fn)
    except OSError:
        return set()
    mods = set()
    for m, names in re.findall(
        r"from (space_spark[\w.]*) import ([\w, ]+)", src
    ):
        try:
            mod = importlib.import_module(m)
        except ImportError:
            mods.add(m)
            continue
        for name in (n.strip() for n in names.split(",") if n.strip()):
            obj = getattr(mod, name, None)
            tgt = getattr(obj, "__module__", None)
            if tgt is None and hasattr(obj, "__name__"):  # submodule
                tgt = obj.__name__
            mods.add(tgt or f"{m}.{name}")
    mods |= set(re.findall(r"\b(space_spark[\w.]+)\.\w", src))
    return {m for m in mods if m.startswith("space_spark")}


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else round_boundary()
    files = changed_files(base)
    # Per changed space_spark module: which top-level names changed
    # (directly or through a module-local helper chain).
    mod_changed_fns = {
        f[:-3].replace("/", "."): changed_functions(base, f)
        for f in files if f.startswith("space_spark/")
    }
    entry_fns = (changed_functions(base, "__spark_entry__.py")
                 if "__spark_entry__.py" in files else set())

    registry = entry_mod._query_registry()
    last = entry_mod._last_green_round()
    window = set(list(entry_mod.queries())[:entry_mod._GATE_WINDOW])
    listed = set(entry_mod._CHURNED_THIS_ROUND)

    print(f"# base: {base[:12]}  changed: {len(files)} py files")
    hits = []
    for name, fn in registry.items():
        why = []
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = ""
        for m in query_modules(fn) & set(mod_changed_fns):
            used = {
                n for n in mod_changed_fns[m]
                if re.search(rf"\b{re.escape(n)}\b", src)
            }
            if used:
                why.append(f"{m}: {','.join(sorted(used))}")
            elif not mod_changed_fns[m]:
                # module-level (non-function) change: flag conservatively
                why.append(f"{m}: module-level change")
        if fn.__name__ in entry_fns:
            why.append("entry fn body")
        if why:
            hits.append((name, why))
    if not hits:
        print("no registered query touched by this diff")
        return
    for name, why in sorted(hits):
        status = ("in window" if name in window else
                  "OUTSIDE window — add to _CHURNED_THIS_ROUND")
        mark = " [listed]" if name in listed else ""
        print(f"{name:32s} last_green=r{last.get(name, '-'):<3} "
              f"{status}{mark}  ({'; '.join(why)})")


if __name__ == "__main__":
    main()
