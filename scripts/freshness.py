"""Evidence-freshness audit: is each query's driver-green row still current?

The external driver samples 50 queries per round and records pass/fail in
``CORRECTNESS_r0N.json``. A green row is evidence about the CODE THAT RAN
THAT ROUND — if the builder (or a helper it calls) was rewritten afterwards,
the row describes retired code. This script makes that staleness visible and
machine-checkable:

- For every declared query, find its LAST driver-green round by scanning the
  committed ``CORRECTNESS_r*.json`` files.
- Reconstruct the package source at the commit the driver actually tested
  (the parent of that round's ``round N: verdict`` marker commit) via
  ``git show``, and hash the builder's *closure* at TWO depths:

  * **module closure** — the decorated function (decorator included, so the
    oracle SQL counts) plus every module-level def / class / constant it
    references, transitively, within its own module. This drives the
    fresh/stale status and the rotation: it changes exactly when the
    query's own logic is edited.
  * **deep closure** — additionally follows intra-package ``from .x import
    y`` imports into sibling modules (catalog.table, exprs.pround, shared
    pipeline helpers, ...), transitively. A deep-stale-but-module-fresh
    query means a SHARED helper changed under it. Shared helpers are
    exercised by every query in the per-round tri-tier local sweeps
    (228/228 at sf0.001/0.01/0.1), so deep staleness is reported as a
    secondary signal and used as a tiebreak for re-slot priority rather
    than flooding the 50-slot rotation whenever one shared helper moves.

- A query is **fresh-green** iff its module-closure hash at its last green
  round equals the hash at HEAD; **stale** otherwise; **never** when no
  driver row exists yet.

Output: one line per non-fresh query (deep-stale flagged on fresh ones),
plus a summary. ``--rotation`` emits a generated 50-name SHOWCASE tuple:
never-tested first, then stale, then re-slots — deep-stale first, then
oldest-evidence — paste into registry.py.

Usage:
    python scripts/freshness.py            # audit + stale list
    python scripts/freshness.py --rotation # emit generated SHOWCASE tuple
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
import subprocess
import sys
from pathlib import Path
from typing import Callable

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mrs_mapreduce_spark.registry import load_all  # noqa: E402

ROTATION_SIZE = 50
PACKAGE = "mrs_mapreduce_spark"


def _round_markers() -> dict[int, str]:
    """round number -> commit sha of the code state the driver tested."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout
    markers: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            # the driver ran correctness on the commit BEFORE the artifacts
            markers[int(m.group(1))] = sha + "^"
    return markers


def _artifact_rev(rnd: int) -> str:
    """Evidence revision for a round whose verdict marker doesn't exist yet.

    Mid-round fallback (ADVICE r7): resolve to the commit that first
    introduced CORRECTNESS_r{N}.json — the driver tested the snapshot
    just before committing the artifact, so its parent (the ``^``
    convention _round_markers uses) is the tested code state. An
    artifact present only in the worktree (uncommitted) means the
    driver tested the current tree: HEAD is then genuinely correct.
    """
    for pat in (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"):
        proc = subprocess.run(
            ["git", "log", "--diff-filter=A", "-1", "--format=%H",
             "--", pat],
            cwd=REPO, capture_output=True, text=True,
        )
        sha = proc.stdout.strip()
        if proc.returncode == 0 and sha:
            return sha + "^"
    return "HEAD"


def _green_rounds() -> dict[str, int]:
    """query name -> latest round with a fully-green driver row."""
    latest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


class _ClosureSet:
    """Lazily-parsed package modules for ONE source revision."""

    def __init__(self, loader: Callable[[str], str | None]):
        self.loader = loader
        self.modules: dict[str, _Closure | None] = {}

    def module(self, relpath: str) -> "_Closure | None":
        if relpath not in self.modules:
            text = self.loader(relpath)
            self.modules[relpath] = (
                _Closure(text, relpath, self) if text is not None else None
            )
        return self.modules[relpath]


class _Closure:
    """Builder-closure extraction over one module's source text."""

    def __init__(self, source: str, relpath: str, closures: _ClosureSet):
        self.source = source
        self.relpath = relpath
        self.closures = closures
        self.tree = ast.parse(source)
        self.toplevel: dict[str, ast.stmt] = {}
        self.by_query: dict[str, ast.stmt] = {}
        #: imported name -> (module relpath, original symbol name)
        self.imports: dict[str, tuple[str, str]] = {}
        pkg_parts = relpath[:-3].split("/")[:-1]  # containing package
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.toplevel[node.name] = node
                for dec in node.decorator_list:
                    if (isinstance(dec, ast.Call)
                            and isinstance(dec.func, ast.Name)
                            and dec.func.id == "register"
                            and dec.args
                            and isinstance(dec.args[0], ast.Constant)):
                        self.by_query[dec.args[0].value] = node
            elif isinstance(node, ast.Assign):
                for tgt in node.targets:
                    if isinstance(tgt, ast.Name):
                        self.toplevel[tgt.id] = node
            elif isinstance(node, ast.AnnAssign):
                if isinstance(node.target, ast.Name):
                    self.toplevel[node.target.id] = node
            elif isinstance(node, ast.ImportFrom):
                if node.level > 0:
                    base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                elif node.module and node.module.split(".")[0] == PACKAGE:
                    base = []
                else:
                    continue  # stdlib / third-party: not package source
                mod = node.module.split(".") if node.module else []
                target = "/".join(base + mod) + ".py"
                for alias in node.names:
                    if alias.name == "*":
                        continue
                    self.imports[alias.asname or alias.name] = (
                        target, alias.name,
                    )

    def _segment(self, node: ast.stmt) -> str:
        parts = []
        for dec in getattr(node, "decorator_list", []):
            parts.append(ast.get_source_segment(self.source, dec) or "")
        parts.append(ast.get_source_segment(self.source, node) or "")
        return "\n".join(parts)

    def _walk(
        self,
        node: ast.stmt,
        out: dict[tuple[str, str], str],
        seen: set[tuple[str, str]],
        deep: bool,
    ) -> None:
        for sub in ast.walk(node):
            if not isinstance(sub, ast.Name):
                continue
            nm = sub.id
            if nm in self.toplevel:
                key = (self.relpath, nm)
                if key in seen:
                    continue
                seen.add(key)
                tgt = self.toplevel[nm]
                out[key] = self._segment(tgt)
                self._walk(tgt, out, seen, deep)
            elif deep and nm in self.imports:
                rel, orig = self.imports[nm]
                key = (rel, orig)
                if key in seen:
                    continue
                seen.add(key)
                cs = self.closures.module(rel)
                tgt = cs.toplevel.get(orig) if cs is not None else None
                if tgt is None:
                    continue  # a module import or missing symbol
                out[key] = cs._segment(tgt)
                cs._walk(tgt, out, seen, deep)

    def hash_for(self, query: str, deep: bool = False) -> str | None:
        root = self.by_query.get(query)
        if root is None:
            return None
        out: dict[tuple[str, str], str] = {}
        seen = {(self.relpath, root.name)}
        self._walk(root, out, seen, deep)
        blob = self._segment(root) + "".join(
            out[k] for k in sorted(out)
        )
        return hashlib.sha256(blob.encode()).hexdigest()


def _git_show(rev: str, relpath: str) -> str | None:
    proc = subprocess.run(
        ["git", "show", f"{rev}:{relpath}"], cwd=REPO,
        capture_output=True, text=True,
    )
    return proc.stdout if proc.returncode == 0 else None


def audit() -> dict[str, dict]:
    registry = load_all()
    greens = _green_rounds()
    markers = _round_markers()
    cur_set = _ClosureSet(
        lambda rel: (REPO / rel).read_text()
        if (REPO / rel).is_file() else None
    )
    old_sets: dict[str, _ClosureSet] = {}
    report: dict[str, dict] = {}
    for name, q in registry.items():
        relpath = q.builder.__module__.replace(".", "/") + ".py"
        cur = cur_set.module(relpath)
        cur_hash = cur.hash_for(name) if cur else None
        cur_deep = cur.hash_for(name, deep=True) if cur else None
        rnd = greens.get(name)
        if rnd is None:
            report[name] = {"status": "never", "round": None, "deep": None}
            continue
        # Mid-round, CORRECTNESS_r{N}.json exists before the "round N:
        # verdict" marker commit does. A bare HEAD fallback opened a
        # false-fresh window (ADVICE r7): builder edits committed AFTER
        # the driver's green run but before the marker compared
        # HEAD-vs-HEAD and read as fresh. Anchor the fallback to the
        # commit that introduced the round's CORRECTNESS artifact (the
        # driver tested the snapshot just before committing it, same ^
        # convention as the marker); only if the artifact is still
        # uncommitted did the driver test the current tree → HEAD.
        rev = markers.get(rnd)
        if rev is None:
            rev = _artifact_rev(rnd)
        if rev not in old_sets:
            old_sets[rev] = _ClosureSet(
                lambda rel, _rev=rev: _git_show(_rev, rel)
            )
        old = old_sets[rev].module(relpath)
        old_hash = old.hash_for(name) if old is not None else None
        old_deep = old.hash_for(name, deep=True) if old is not None else None
        if old_hash is None:
            status = "stale"  # file/function absent at green commit
        elif old_hash == cur_hash:
            status = "fresh"
        else:
            status = "stale"
        report[name] = {
            "status": status,
            "round": rnd,
            # deep=True: the cross-module closure ALSO matches; False: a
            # shared helper changed since the evidence (covered by the
            # per-round tri-tier sweeps, surfaced for re-slot priority)
            "deep": (old_deep == cur_deep) if status == "fresh" else False,
        }
    return report


def rotation(report: dict[str, dict]) -> list[str]:
    registry = load_all()
    order = list(registry)  # current queries()/SHOWCASE-first order
    never = [n for n in order if report[n]["status"] == "never"]
    stale = [n for n in order if report[n]["status"] == "stale"]
    fresh = sorted(
        (n for n in order if report[n]["status"] == "fresh"),
        key=lambda n: (
            report[n]["round"],         # oldest evidence first (r8
            #                             verdict task 4: burn the
            #                             r1-r3 evidence tail before
            #                             anything else)
            report[n]["deep"],          # then deep-stale (False) first
            order.index(n),
        ),
    )
    picked = never + stale
    picked += [n for n in fresh if n not in picked][: ROTATION_SIZE - len(picked)]
    return picked[:ROTATION_SIZE]


def main() -> None:
    report = audit()
    counts = {"fresh": 0, "stale": 0, "never": 0}
    deep_stale = 0
    for name, row in report.items():
        counts[row["status"]] += 1
        if row["status"] == "fresh" and not row["deep"]:
            deep_stale += 1
    if "--rotation" in sys.argv:
        names = rotation(report)
        print("SHOWCASE: tuple[str, ...] = (")
        for i in range(0, len(names), 3):
            print("    " + " ".join(f'"{n}",' for n in names[i:i + 3]))
        print(")")
        return
    for name, row in sorted(report.items()):
        if row["status"] != "fresh":
            print(f"[{row['status']}] {name} (last green: r{row['round']})")
        elif not row["deep"]:
            print(
                f"[deep-stale] {name} (module-fresh r{row['round']}; a"
                " shared cross-module helper changed since)"
            )
    print(
        f"\n{counts['fresh']} fresh-green ({deep_stale} of them deep-stale"
        f" via shared helpers), {counts['stale']} stale, "
        f"{counts['never']} never driver-tested "
        f"(of {len(report)} declared)"
    )


if __name__ == "__main__":
    main()
