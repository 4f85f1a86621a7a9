"""Evidence-freshness audit: is each query's driver-green row still current?

The external driver samples 50 queries per round and records pass/fail in
``CORRECTNESS_r0N.json``. A green row is evidence about the CODE THAT RAN
THAT ROUND — if the builder (or a helper it calls) was rewritten afterwards,
the row describes retired code. This script makes that staleness visible and
machine-checkable:

- For every declared query, find its LAST driver-green round by scanning the
  committed ``CORRECTNESS_r*.json`` files.
- Reconstruct the module source at the commit the driver actually tested
  (the parent of that round's ``round N: verdict`` marker commit) via
  ``git show``, and hash the builder's *closure*: the decorated function
  (decorator included, so the oracle SQL counts) plus every module-level
  def / class / constant it references, transitively.
- A query is **fresh-green** iff the closure hash at its last green round
  equals the closure hash at HEAD. Otherwise it is **stale** (code changed
  since the evidence) or **never** (no driver row yet).

Output: one line per non-fresh query, plus a summary. ``--rotation`` emits a
generated 50-name SHOWCASE tuple: never-tested first, then stale, then
re-slots filled oldest-evidence-first — paste into registry.py.

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

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mrs_mapreduce_spark.registry import load_all  # noqa: E402

ROTATION_SIZE = 50


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


class _Closure:
    """Builder-closure extraction over one module's source text."""

    def __init__(self, source: str):
        self.source = source
        self.tree = ast.parse(source)
        self.toplevel: dict[str, ast.stmt] = {}
        self.by_query: dict[str, ast.stmt] = {}
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

    def _segment(self, node: ast.stmt) -> str:
        parts = []
        for dec in getattr(node, "decorator_list", []):
            parts.append(ast.get_source_segment(self.source, dec) or "")
        parts.append(ast.get_source_segment(self.source, node) or "")
        return "\n".join(parts)

    def hash_for(self, query: str) -> str | None:
        root = self.by_query.get(query)
        if root is None:
            return None
        # transitive closure of module-level names referenced from root
        want: dict[str, ast.stmt] = {}
        frontier = [root]
        seen_names: set[str] = set()
        while frontier:
            node = frontier.pop()
            for sub in ast.walk(node):
                if isinstance(sub, ast.Name) and sub.id not in seen_names:
                    seen_names.add(sub.id)
                    tgt = self.toplevel.get(sub.id)
                    if tgt is not None and tgt is not root:
                        if id(tgt) not in {id(v) for v in want.values()}:
                            want[sub.id] = tgt
                            frontier.append(tgt)
        blob = self._segment(root) + "".join(
            self._segment(want[k]) for k in sorted(want)
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
    cur_closures: dict[str, _Closure] = {}
    old_cache: dict[tuple[str, str], _Closure | None] = {}
    report: dict[str, dict] = {}
    for name, q in registry.items():
        relpath = q.builder.__module__.replace(".", "/") + ".py"
        if relpath not in cur_closures:
            cur_closures[relpath] = _Closure(
                (REPO / relpath).read_text()
            )
        cur_hash = cur_closures[relpath].hash_for(name)
        rnd = greens.get(name)
        if rnd is None:
            report[name] = {"status": "never", "round": None}
            continue
        rev = markers.get(rnd)
        key = (rev, relpath)
        if key not in old_cache:
            text = _git_show(rev, relpath)
            old_cache[key] = _Closure(text) if text is not None else None
        old = old_cache[key]
        old_hash = old.hash_for(name) if old is not None else None
        if old_hash is None:
            status = "stale"  # file/function absent at green commit
        elif old_hash == cur_hash:
            status = "fresh"
        else:
            status = "stale"
        report[name] = {"status": status, "round": rnd}
    return report


def rotation(report: dict[str, dict]) -> list[str]:
    registry = load_all()
    order = list(registry)  # current queries()/SHOWCASE-first order
    never = [n for n in order if report[n]["status"] == "never"]
    stale = [n for n in order if report[n]["status"] == "stale"]
    fresh = sorted(
        (n for n in order if report[n]["status"] == "fresh"),
        key=lambda n: (report[n]["round"], order.index(n)),
    )  # oldest evidence first
    picked = never + stale
    picked += [n for n in fresh if n not in picked][: ROTATION_SIZE - len(picked)]
    return picked[:ROTATION_SIZE]


def main() -> None:
    report = audit()
    counts = {"fresh": 0, "stale": 0, "never": 0}
    for name, row in report.items():
        counts[row["status"]] += 1
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
    print(
        f"\n{counts['fresh']} fresh-green, {counts['stale']} stale, "
        f"{counts['never']} never driver-tested "
        f"(of {len(report)} declared)"
    )


if __name__ == "__main__":
    main()
