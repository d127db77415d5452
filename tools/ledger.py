"""Computed staleness ledger for the driver correctness registry.

VERDICT r9 "Next" #3: the rotation plan is only as good as its
bookkeeping, and two rounds running the hand-maintained comment in
``__spark_entry__.py`` claimed a convergence it didn't have. This
script COMPUTES, for every registered query id:

  * ``row_round``  — the latest round whose ``CORRECTNESS_r0N.json``
    has a row for the id (and whether that row is green);
  * ``code_round`` — the round of the last git commit that touched the
    id's implementation, where "implementation" means the query
    function itself (git ``-L :func:file`` — function-level, so an
    edit elsewhere in a 2,600-line registry module does NOT stain every
    id in it) plus the transitive closure of NON-registry package
    modules its body references (file-level: operators/, sources/,
    streaming/, pipelines/, lake.py, … — cohesive modules where any
    change plausibly shifts behavior).

An id is STALE when ``row_round < code_round``: its latest driver row
predates its implementation. The r10+ invariant is zero stale ids
after each round's rotation; run this at end of round instead of
trusting a comment.

Deliberately conservative: file-level closure over operator modules
over-flags (a comment-only edit to dedup.py stains every dedup id) —
acceptable, because the cost of a false "stale" is one re-check slot
while the cost of a false "fresh" is an unverified operator.

Usage: ``python tools/ledger.py [--window N]`` from the repo root.
Prints a per-id table of stale/never-checked/red ids and a suggested
check-window head (stale first, then oldest rows).
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys
from functools import lru_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "hudi_spark_utilities_plus_spark"
PKG_DIR = os.path.join(REPO, PKG)
# Registry modules: huge, many-ids-per-file — tracked at FUNCTION level.
REGISTRY_MODULES = {
    "queries.py",
    "queries_extra.py",
    "queries_llm.py",
    "queries_pipeline.py",
    "queries_tpch.py",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True
    ).stdout


def round_boundaries() -> list[tuple[int, int]]:
    """[(round, end_ts)] from the driver's per-round artifact commits."""
    out = _git("log", "--format=%ct %s", "--reverse")
    bounds: dict[int, int] = {}
    for line in out.splitlines():
        m = re.match(r"(\d+) round (\d+): verdict", line)
        if m:
            bounds[int(m.group(2))] = max(
                bounds.get(int(m.group(2)), 0), int(m.group(1))
            )
    return sorted(bounds.items())


_BOUNDS = None


def commit_round(ts: int) -> int:
    """Round a commit timestamp falls in (current round if past the end)."""
    global _BOUNDS
    if _BOUNDS is None:
        _BOUNDS = round_boundaries()
    for rnd, end in _BOUNDS:
        if ts <= end:
            return rnd
    return _BOUNDS[-1][0] + 1 if _BOUNDS else 1


@lru_cache(maxsize=None)
def file_last_change_ts(relpath: str) -> int:
    out = _git("log", "-1", "--format=%ct", "--", relpath)
    return int(out.strip() or 0)


@lru_cache(maxsize=None)
def func_last_change_ts(span: tuple[int, int], relpath: str) -> int:
    """Last commit touching the function's lines (git log -L).

    Uses the AST-exact line span (first decorator through end of body),
    NOT -L's ``:funcname:`` form: git's python funcname regex matches
    only ``def``/``class`` headers, so a region runs from one def to the
    next and swallows the NEXT function's decorators — a commit that
    merely appended a new @query block after this one would stain it
    (observed: stream_tumbling flagged by the commit that added
    hudi_restore_read below it). Decorators stay in the span because
    the oracle SQL lives there."""
    lo, hi = span
    out = _git("log", f"-L{lo},{hi}:{relpath}", "--format=%ct", "-s")
    for line in out.splitlines():
        if line.strip().isdigit():
            return int(line.strip())
    # -L failed: fall back to the file.
    return file_last_change_ts(relpath)


def _module_files() -> dict[str, str]:
    """module dotted suffix -> repo-relative path, for the package."""
    files = {}
    for p in glob.glob(os.path.join(PKG_DIR, "**", "*.py"), recursive=True):
        rel = os.path.relpath(p, REPO)
        dotted = rel[: -len(".py")].replace(os.sep, ".")
        files[dotted] = rel
    return files


def _package_imports(tree: ast.Module, this_mod: str) -> dict[str, str]:
    """imported-name -> package module (dotted). Walks the WHOLE module,
    not just top-level statements: operator modules lazy-import inside
    functions too (global_windows._materialize imports materialize), and
    a closure that missed those would under-stain their consumers."""
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.level:  # relative import
                base = this_mod.rsplit(".", node.level)[0]
                mod = f"{base}.{node.module}" if node.module else base
            else:
                mod = node.module or ""
            if not mod.startswith(PKG):
                continue
            for alias in node.names:
                name = alias.asname or alias.name
                # "from .operators import dedup" imports a MODULE
                sub = f"{mod}.{alias.name}"
                out[name] = sub if sub in _MODULES else mod
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    out[alias.asname or alias.name.split(".")[0]] = alias.name
    return out


_MODULES = _module_files()
_AST: dict[str, ast.Module] = {}
for _mod, _rel in _MODULES.items():
    with open(os.path.join(REPO, _rel)) as f:
        _AST[_mod] = ast.parse(f.read())
_IMPORTS = {m: _package_imports(t, m) for m, t in _AST.items()}


def _closure(mods: set[str]) -> set[str]:
    """Transitive closure over package imports, registry modules excluded
    (they'd stain every id with every edit; their helpers are tracked at
    function level via the query function itself)."""
    seen, todo = set(), list(mods)
    while todo:
        m = todo.pop()
        if m in seen or m not in _MODULES:
            continue
        if os.path.basename(_MODULES[m]) in REGISTRY_MODULES:
            continue
        seen.add(m)
        todo.extend(_IMPORTS.get(m, {}).values())
    return seen


def _direct_deps(node: ast.AST, mod: str, imports: dict[str, str]) -> set[str]:
    """Package modules a function body references — via the module-level
    import map or via function-local lazy imports (excel_scan-style)."""
    used = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
    deps = {imports[n] for n in used if n in imports}
    for sub in ast.walk(node):
        if isinstance(sub, ast.ImportFrom) and (
            sub.level or (sub.module or "").startswith(PKG)
        ):
            if sub.level:
                base = mod.rsplit(".", sub.level)[0]
                m2 = f"{base}.{sub.module}" if sub.module else base
            else:
                m2 = sub.module
            for alias in sub.names:
                cand = f"{m2}.{alias.name}"
                deps.add(cand if cand in _MODULES else m2)
        elif isinstance(sub, ast.Import):
            for alias in sub.names:
                if alias.name.startswith(PKG):
                    deps.add(alias.name)
    return {d for d in deps if d in _MODULES}


def _span(node: ast.FunctionDef) -> tuple[int, int]:
    return (
        min([d.lineno for d in node.decorator_list] + [node.lineno]),
        node.end_lineno,
    )


def registry() -> dict[str, tuple[str, str, set[str], list[tuple[int, int]]]]:
    """id -> (funcname, defining relpath, dep modules, line spans).

    Spans cover the query function PLUS every same-module helper it
    (transitively) calls — stream_demux reaches streaming/demux.py only
    through the shared _drive_demux_stream helper, and a change to that
    helper (or the modules it imports) must stain its callers. Helpers
    imported from OTHER registry modules (e.g. dsum) stay untracked —
    documented gap, they are small and stable."""
    reg: dict[str, tuple[str, str, set[str], list[tuple[int, int]]]] = {}
    for mod, tree in _AST.items():
        if os.path.basename(_MODULES[mod]) not in REGISTRY_MODULES:
            continue
        imports = _IMPORTS[mod]
        module_funcs = {
            n.name: n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        }
        for node in module_funcs.values():
            qid = None
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and isinstance(dec.func, ast.Name)
                    and dec.func.id == "query"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    qid = dec.args[0].value
            if qid is None:
                continue
            # BFS through same-module helper calls
            deps: set[str] = set()
            spans: list[tuple[int, int]] = []
            seen: set[str] = set()
            todo = [node]
            while todo:
                cur = todo.pop()
                if cur.name in seen:
                    continue
                seen.add(cur.name)
                spans.append(_span(cur))
                deps |= _direct_deps(cur, mod, imports)
                for n in ast.walk(cur):
                    if (
                        isinstance(n, ast.Name)
                        and n.id in module_funcs
                        and n.id not in seen
                    ):
                        todo.append(module_funcs[n.id])
            reg[qid] = (node.name, _MODULES[mod], _closure(deps), spans)
    return reg


def driver_rows() -> dict[str, tuple[int, bool]]:
    """id -> (latest round with a row, that row green?)."""
    rows: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            data = json.load(f)
        for qid, row in data.items():
            green = (
                row.get("err") is None
                and row.get("rows_match") is not False
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if qid not in rows or rnd >= rows[qid][0]:
                rows[qid] = (rnd, green)
    return rows


def _explain(qid: str) -> None:
    """Print the commits that set the id's code round — which change a
    stale flag traces to, so postponement decisions are evidence-based."""
    reg = registry()
    if qid not in reg:
        print(f"unknown id {qid}")
        return
    fn, relpath, deps, spans = reg[qid]
    print(f"{qid}: function {fn} @ {relpath}")
    for span in spans:
        out = _git(
            "log", "-1", f"-L{span[0]},{span[1]}:{relpath}",
            "--format=%h %ad %s", "-s", "--date=short",
        )
        own = next((ln for ln in out.splitlines() if ln.strip()), "?")
        rnd = commit_round(func_last_change_ts(span, relpath))
        print(f"  span  {span[0]}-{span[1]} r{rnd}: {own}")
    for dep in sorted(deps):
        rel = _MODULES[dep]
        line = _git("log", "-1", "--format=%h %ad %s", "--date=short", "--", rel).strip()
        print(f"  dep   r{commit_round(file_last_change_ts(rel))}: {rel}: {line}")


def main() -> int:
    window = 50
    if "--explain" in sys.argv:
        for qid in sys.argv[sys.argv.index("--explain") + 1 :]:
            _explain(qid)
        return 0
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])
    reg = registry()
    rows = driver_rows()
    report = []
    for qid, (fn, relpath, deps, spans) in sorted(reg.items()):
        ts = max(func_last_change_ts(s, relpath) for s in spans)
        for dep in deps:
            ts = max(ts, file_last_change_ts(_MODULES[dep]))
        code_rnd = commit_round(ts)
        row_rnd, green = rows.get(qid, (None, None))
        status = (
            "NEVER"
            if row_rnd is None
            else "RED"
            if not green
            else "STALE"
            if row_rnd < code_rnd
            else "ok"
        )
        report.append((qid, row_rnd, code_rnd, status))

    bad = [r for r in report if r[3] != "ok"]
    print(f"{len(report)} ids; {len(bad)} need attention")
    print(f"{'id':38} {'row':>4} {'code':>4} status")
    for qid, row_rnd, code_rnd, status in report:
        if status != "ok":
            print(f"{qid:38} {str(row_rnd):>4} {code_rnd:>4} {status}")
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        rounds_seen = sorted(
            int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        )
        with open(out, "w") as fh:
            json.dump(
                {
                    "head": _git("rev-parse", "HEAD").strip(),
                    # which snapshot this is (ADVICE r15): a ledger
                    # committed DURING round N+1's build sees rows only
                    # through CORRECTNESS_rN — its stale set is the
                    # window-computation (pre-grade) state, and the ids
                    # it flags must all sit in the 50-head. The
                    # post-grade state (expect 0 stale) is what the
                    # judge reproduces at the NEXT head, where round
                    # N+1's correctness artifact exists.
                    "snapshot": {
                        "rows_through_round": rounds_seen[-1]
                        if rounds_seen
                        else None,
                        "meaning": (
                            "pre-grade window-computation state: "
                            "stale/never ids here are exactly the set "
                            "the current _CHECK_ORDER head must cover; "
                            "re-run at the post-grade head to see them "
                            "clear"
                        ),
                    },
                    "ids": {
                        qid: {"row": r, "code": c, "status": s}
                        for qid, r, c, s in report
                    },
                    "summary": {
                        "total": len(report),
                        "stale": sum(1 for r in report if r[3] == "STALE"),
                        "never": sum(1 for r in report if r[3] == "NEVER"),
                        "red": sum(1 for r in report if r[3] == "RED"),
                    },
                },
                fh,
                indent=1,
            )
    # Suggested window: never/red/stale first (by row age), then oldest rows.
    prio = {"NEVER": 0, "RED": 1, "STALE": 2, "ok": 3}
    ordered = sorted(
        report, key=lambda r: (prio[r[3]], r[1] if r[1] is not None else -1)
    )
    print("\nsuggested window head:")
    print(json.dumps([r[0] for r in ordered[:window]], indent=1))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
