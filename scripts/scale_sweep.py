"""Scaling-curve sweep: run headline queries at every fixture tier.

Evidence for the 100 TB design claims: per-query wall time at
sf0.001 / sf0.01 / sf0.1 (1x / 10x / 100x rows). A scale-correct plan
shows near-flat time while fixed stage overhead dominates, then linear
growth once per-row work does — superlinear growth at the top tier is
the smell this sweep exists to catch (it would indicate a shuffle or
window whose cost is super-proportional in the input).

Usage: python scripts/scale_sweep.py [query ...]
Prints one JSON line per query with per-tier medians.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mrs_mapreduce_spark.registry import load_all  # noqa: E402
from mrs_mapreduce_spark.session import get_session  # noqa: E402

TIERS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
         "/root/testdata/sf0.1"]
DEFAULT = [
    "groupby_agg", "tpch_q3", "window_frame", "dedup_minhash",
    "text_tfidf", "similarity_topk", "events_session_ids", "join_asof",
]


def median_time(builder, spark, sf_dir, runs: int = 3) -> float:
    builder(spark, sf_dir).collect()  # warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        builder(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_session("scale-sweep")
    registry = load_all()
    for name in names:
        row = {"query": name}
        for tier in TIERS:
            sf = tier.rsplit("sf", 1)[-1]
            row[f"sf{sf}"] = round(
                median_time(registry[name].builder, spark, tier), 4
            )
        lo, hi = row["sf0.001"], row["sf0.1"]
        row["t_ratio_100x_rows"] = round(hi / lo, 2)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
