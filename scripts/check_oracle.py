"""Run the full declared inventory against the local DuckDB oracle.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
Default sf_dir: /root/testdata/sf0.01 (the driver's correctness tier).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mrs_mapreduce_spark.oracle import check_queries  # noqa: E402
from mrs_mapreduce_spark.session import get_session  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or None
    spark = get_session("oracle-check")
    t0 = time.time()
    results = check_queries(spark, sf_dir, names)
    n_ok = sum(r.ok for r in results)
    for r in results:
        print(r)
    print(f"\n{n_ok}/{len(results)} OK in {time.time() - t0:.1f}s @ {sf_dir}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
