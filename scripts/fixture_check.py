"""Detect driver-side fixture regeneration between rounds.

The driver rewrites /root/testdata each round and has already changed
physical parquet types once (round 1→2: events.ts TIMESTAMP(NANOS) →
TIMESTAMP(MICROS), which silently broke 23 queries until the catalog
became layout-adaptive). Run this FIRST thing every round:

    python scripts/fixture_check.py [sf_dir ...]

Exits 0 and prints one line per table when the layout matches the last
recorded snapshot (scripts/fixture_snapshot.json); exits 1 and prints a
diff when anything changed — then update the snapshot, re-run the full
oracle sweep, and audit catalog.table / streaming/source.py first.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SNAPSHOT = Path(__file__).resolve().parent / "fixture_snapshot.json"


def layout(sf_dir: str) -> dict:
    out = {}
    for t in TABLES:
        path = Path(sf_dir) / f"{t}.parquet"
        if not path.exists():
            # a table the driver deleted is drift, not a crash
            out[t] = {"rows": None, "cols": {"<MISSING FILE>": str(path)}}
            continue
        f = pq.ParquetFile(path)
        out[t] = {
            "rows": f.metadata.num_rows,
            "cols": {
                field.name: str(field.type) for field in f.schema_arrow
            },
        }
    return out


def main() -> int:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    current = {d: layout(d) for d in sf_dirs}
    if not SNAPSHOT.exists():
        SNAPSHOT.write_text(json.dumps(current, indent=1, sort_keys=True))
        print(f"snapshot written: {SNAPSHOT}")
        return 0
    recorded = json.loads(SNAPSHOT.read_text())
    changed = False
    for d, tables in current.items():
        prev = recorded.get(d)
        if prev is None:
            # an unverified layout is exactly what this script exists to
            # catch — unknown dirs are drift until snapshotted
            changed = True
            print(f"[NEW DIR — UNVERIFIED] {d} (not in snapshot)")
            continue
        for t in sorted(set(prev) - set(tables)):
            changed = True
            print(f"[TABLE GONE FROM CHECK LIST] {d}/{t} was snapshotted")
        for t, cur in tables.items():
            old = prev.get(t, {})
            if cur["cols"] != old.get("cols"):
                changed = True
                print(f"[SCHEMA CHANGED] {d}/{t}:")
                for c in sorted(set(cur["cols"]) | set(old.get("cols", {}))):
                    a, b = old.get("cols", {}).get(c), cur["cols"].get(c)
                    if a != b:
                        print(f"    {c}: {a} -> {b}")
            elif cur["rows"] != old.get("rows"):
                changed = True
                print(
                    f"[rows changed] {d}/{t}: {old.get('rows')} -> "
                    f"{cur['rows']}"
                )
            else:
                print(f"[ok] {d}/{t} rows={cur['rows']}")
    if changed:
        print(
            "\nFixtures were regenerated with layout changes. Re-run the "
            "full oracle sweep (scripts/check_oracle.py) and audit "
            "catalog.table / streaming/source.py, then refresh the "
            "snapshot: rm scripts/fixture_snapshot.json && "
            "python scripts/fixture_check.py <dirs>"
        )
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main())
