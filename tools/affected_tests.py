"""Machine-derived test selection: changed files → the test files that
exercise them, via the repo's own import graph (round-10 verdict #5).

The full suite is ~46 min and growing; post-review commits were being
validated by hand-picked targeted re-runs — honest, but builder-chosen.
This tool makes the selection mechanical so COVERAGE.md can quote it:

1. Every module under ``pixie_spark/``, ``tools/`` and the repo root
   (``bench.py``, ``__spark_entry__.py``) is AST-parsed for its
   repo-internal imports (module-level AND function-level — the px
   surface imports lazily), giving a module dependency graph. Importing
   a submodule executes its parent packages, so implicit
   submodule→package edges are added too.
2. Changed modules propagate through the REVERSE transitive closure:
   a change to ``operators/dedup.py`` affects ``queries.py`` affects
   everything importing the registry.
3. A test file is selected iff it imports any affected module (its own
   AST, same parser). A changed test file selects itself.
4. The always-on tier rides along regardless of the diff: the oracle
   gate (``test_local_oracles.py``), the plan pins (``test_plans.py``)
   and the driver contract (``test_entry.py``) — the three surfaces the
   round is graded on directly.
5. Changes to shared test plumbing (``tests/conftest.py``) or packaging
   config escalate to FULL: the tool prints every test file and says
   why — import graphs can't scope a fixture change.

Usage:
    python tools/affected_tests.py                 # working tree vs HEAD
    python tools/affected_tests.py --base REF      # REF..HEAD + working tree
    python tools/affected_tests.py path1 path2 …   # explicit change set

Prints one test path per line (stderr carries the why); the output is
directly usable as ``python -m pytest $(python tools/affected_tests.py)``.
A full-tree run still happens once per round — this scopes the
per-commit validations in between, it does not replace the full gate.
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(ROOT, "tests")

# the surfaces the round is graded on directly — always in the selection
ALWAYS_ON = ["test_entry.py", "test_local_oracles.py", "test_plans.py"]

# shared plumbing whose blast radius an import graph can't scope
ESCALATE_FULL = {"tests/conftest.py", "pytest.ini", "pyproject.toml", "setup.cfg"}


def _module_name(rel: str) -> str | None:
    """repo-relative .py path → importable module name (None if not a
    module the graph tracks)."""
    if not rel.endswith(".py"):
        return None
    parts = rel[:-3].split("/")
    if parts[-1] == "__init__":
        parts = parts[:-1]
    if not parts:
        return None
    if parts[0] in ("pixie_spark", "tools", "tests"):
        return ".".join(parts)
    if len(parts) == 1:  # repo-root modules: bench, __spark_entry__
        return parts[0]
    return None


def _iter_module_files():
    for base in ("pixie_spark", "tools", "tests"):
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, base)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for n in filenames:
                if n.endswith(".py"):
                    yield os.path.relpath(os.path.join(dirpath, n), ROOT)
    for n in os.listdir(ROOT):
        if n.endswith(".py"):
            yield n


def _internal_imports(path: str, known: set[str], pkg_parts: list[str]) -> set[str]:
    """All repo-internal modules ``path`` imports, resolved against the
    known-module set (a ``from pkg import name`` resolves to pkg.name
    when that is itself a module, else to pkg)."""
    try:
        with open(os.path.join(ROOT, path), encoding="utf-8") as f:
            tree = ast.parse(f.read())
    except (OSError, SyntaxError):
        return set()
    out: set[str] = set()

    def _resolve(mod: str, names: list[str] | None) -> None:
        if names:
            for nm in names:
                cand = f"{mod}.{nm}"
                if cand in known:
                    out.add(cand)
                    continue
                if mod in known:
                    out.add(mod)
        elif mod in known:
            out.add(mod)
        else:  # import pixie_spark.operators.dedup — longest known prefix
            parts = mod.split(".")
            for i in range(len(parts), 0, -1):
                pref = ".".join(parts[:i])
                if pref in known:
                    out.add(pref)
                    break

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                _resolve(alias.name, None)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against this file's package
                base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            _resolve(mod, [a.name for a in node.names])
    return out


def build_graph():
    files = sorted(set(_iter_module_files()))
    mod_of: dict[str, str] = {}  # module → repo-relative file
    for rel in files:
        m = _module_name(rel)
        if m:
            mod_of[m] = rel
    known = set(mod_of)
    imports: dict[str, set[str]] = {}   # EXPLICIT import statements
    implicit: dict[str, set[str]] = {}  # submodule → parent packages
    for m, rel in mod_of.items():
        pkg_parts = m.split(".")[:-1] if not rel.endswith("__init__.py") else m.split(".")
        deps = _internal_imports(rel, known, pkg_parts)
        deps.discard(m)
        imports[m] = deps
        # importing a submodule executes its parent packages — tracked
        # separately: these edges matter when the PACKAGE __init__ itself
        # changes, but must not relay a sibling's change through a
        # re-exporting package to every other submodule's importers
        parents = set()
        parts = m.split(".")
        for i in range(1, len(parts)):
            pref = ".".join(parts[:i])
            if pref in known:
                parents.add(pref)
        implicit[m] = parents
    return mod_of, imports, implicit


def affected_modules(
    changed_mods: set[str],
    imports: dict[str, set[str]],
    implicit: dict[str, set[str]] | None = None,
) -> set[str]:
    """Reverse transitive closure. Explicit import edges propagate
    everywhere; implicit child→parent-package edges are traversed only
    FROM a directly-changed module (a broken/edited __init__ affects
    every submodule's importers; a changed submodule does not affect
    its siblings just because the package re-exports it)."""
    rev: dict[str, set[str]] = {}
    for m, deps in imports.items():
        for d in deps:
            rev.setdefault(d, set()).add(m)
    rev_implicit: dict[str, set[str]] = {}
    for m, parents in (implicit or {}).items():
        for p in parents:
            rev_implicit.setdefault(p, set()).add(m)
    seen = set(changed_mods)
    frontier = list(changed_mods)
    while frontier:
        m = frontier.pop()
        dependents = set(rev.get(m, ()))
        if m in changed_mods:
            dependents |= rev_implicit.get(m, set())
        for dep in dependents:
            if dep not in seen:
                seen.add(dep)
                frontier.append(dep)
    return seen


def select(changed: list[str]) -> tuple[list[str], str]:
    """changed repo-relative paths → (sorted test paths, reason)."""
    all_tests = sorted(
        f"tests/{n}" for n in os.listdir(TESTS)
        if n.startswith("test_") and n.endswith(".py")
    )
    if any(c in ESCALATE_FULL for c in changed):
        return all_tests, "FULL: shared test plumbing changed"
    mod_of, imports, implicit = build_graph()
    changed_mods = {m for m in (_module_name(c) for c in changed) if m}
    affected = affected_modules(changed_mods, imports, implicit)
    picked = {f"tests/{n}" for n in ALWAYS_ON}
    for t in all_tests:
        # tests are graph nodes, so the reverse closure already contains
        # every test importing an affected module — and a directly
        # changed test file seeds the closure itself
        if _module_name(t) in affected:
            picked.add(t)
    reason = (
        f"{len(changed_mods)} changed module(s) → {len(affected)} affected "
        f"→ {len(picked)}/{len(all_tests)} test files (+always-on tier)"
    )
    return sorted(p for p in picked if os.path.exists(os.path.join(ROOT, p))), reason


def _git_changed(base: str | None) -> list[str]:
    cmds = [["git", "diff", "--name-only", "HEAD"]]
    if base:
        cmds.append(["git", "diff", "--name-only", f"{base}...HEAD"])
    cmds.append(["git", "ls-files", "--others", "--exclude-standard"])
    out: set[str] = set()
    for cmd in cmds:
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
        out.update(ln.strip() for ln in r.stdout.splitlines() if ln.strip())
    return sorted(out)


def main() -> None:
    args = sys.argv[1:]
    base = None
    if "--base" in args:
        i = args.index("--base")
        base = args[i + 1]
        args = args[:i] + args[i + 2:]
    changed = args or _git_changed(base)
    tests, reason = select(changed)
    print(f"# {reason}", file=sys.stderr)
    print(f"# changed: {' '.join(changed) or '(none)'}", file=sys.stderr)
    for t in tests:
        print(t)


if __name__ == "__main__":
    main()
