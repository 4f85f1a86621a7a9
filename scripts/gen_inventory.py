"""Regenerate INVENTORY.md from the query registry.

Usage: python scripts/gen_inventory.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mrs_mapreduce_spark.registry import load_all  # noqa: E402

HEADER = """# INVENTORY — declared, oracle-checked operator coverage

Generated from the query registry (`python scripts/gen_inventory.py`).
Every row is one `queries()` entry in `__spark_entry__.py`; "oracle"
means an exact DuckDB SQL twin is declared and value-hash-verified
(rows-only = genuinely estimator-/streaming-specific, checked for row
count only). The *survey* column maps each query to its SURVEY.md §2
inventory row.

| query | SURVEY §2 | oracle | builder |
|---|---|---|---|
"""


def main() -> None:
    registry = load_all()
    lines = [HEADER]
    for name in sorted(registry):
        q = registry[name]
        mod = q.builder.__module__.replace("mrs_mapreduce_spark.", "")
        oracle = "exact SQL" if q.oracle else "rows-only"
        lines.append(f"| `{name}` | {q.survey} | {oracle} | `{mod}` |\n")
    n_oracle = sum(1 for q in registry.values() if q.oracle)
    lines.append(
        f"\n**{len(registry)} declared queries — {n_oracle} with exact SQL"
        f" oracles, {len(registry) - n_oracle} rows-only.**\n"
    )
    Path(__file__).resolve().parent.parent.joinpath("INVENTORY.md").write_text(
        "".join(lines)
    )
    print(f"INVENTORY.md: {len(registry)} queries")


if __name__ == "__main__":
    main()
