#!/usr/bin/env python
"""Build a synthetic 10x tier from sf0.1 and time the heavy query family.

The driver's fixtures stop at sf0.1 (1x/10x/100x rows across the three
tiers); this script probes ONE MORE DECADE by materializing an
FK-consistent sf1-equivalent under /tmp — ten copies of every sf0.1
table with all entity keys offset per copy (region/nation are dimension
roots and stay as-is, so nationkey joins still resolve) — and running
the expensive queries on it. A plan whose sf0.01→sf0.1 ratio hides a
superlinear term shows it here.

The synthetic tier is a DEV TOOL for scale evidence (recorded in
SCALE.md): declared-query correctness always runs on the driver's own
fixtures, never on synthesized data.

Usage::

    python scripts/synth_scale.py [--copies 10] [--out /tmp/sf1_synth]
    python scripts/synth_scale.py --queries q1,dedup_minhash ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mrs_mapreduce_spark.registry import load_all  # noqa: E402
from mrs_mapreduce_spark.session import get_session  # noqa: E402

SRC = "/root/testdata/sf0.1"

#: key columns to offset per copy: (table, column, stride source table)
#: stride = 1 + max(key) over the source so replica key ranges are disjoint
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: which entity each FK column counts under (stride must match the PK's)
STRIDE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

DIMENSION_ROOTS = ["region", "nation"]

HEAVY = [
    "q1:groupby_agg",  # alias:registry-name
    "q3:tpch_q3",
    "dedup_minhash",
    "dedup_minhash_pairs",
    "dedup_substring",
    "dedup_semdedup",
    "dedup_ngram_jaccard_simblocked",
    "text_perplexity",
    "text_bm25",
    "text_tfidf",
    "similarity_ivf_trained",
    "similarity_lsh_multiprobe",
    "events_rfm",
    "events_session_ids",
    "window_frame",
    "sketch_countmin",
    "corpus_decontaminate",
    "corpus_pack_contexts",
]


def build(spark, out: str, copies: int) -> None:
    strides: dict[tuple[str, str], int] = {}
    for t, cols in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for c in cols:
            ent = STRIDE_OF[c]
            if ent not in strides:
                src_t, src_c = ent
                mx = (
                    spark.read.parquet(f"{SRC}/{src_t}.parquet")
                    .agg(F.max(src_c))
                    .collect()[0][0]
                )
                strides[ent] = int(mx) + 1
    for t in DIMENSION_ROOTS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    for t, cols in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(copies):
            d = df
            for c in cols:
                d = d.withColumn(
                    c, (F.col(c) + F.lit(i * strides[STRIDE_OF[c]])).cast("long")
                )
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.union(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"[built] {t}: {u.count()} rows", file=sys.stderr)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1_synth")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--all", action="store_true",
                    help="run EVERY declared query at the synthetic tier")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args(argv)

    spark = get_session("synth-scale")
    if not args.skip_build:
        build(spark, args.out, args.copies)

    registry = load_all()
    if args.all:
        wanted = sorted(registry)
    else:
        wanted = args.queries.split(",") if args.queries else HEAVY
    times = {}
    for spec in wanted:
        label, _, name = spec.partition(":")
        name = name or label
        try:
            t0 = time.perf_counter()
            n = registry[name].builder(spark, args.out).count()
            dt = time.perf_counter() - t0
            times[label] = round(dt, 3)
            print(f"[ran] {label}: {dt:.2f}s rows={n}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            times[label] = -1.0
            print(f"[ERR] {label}: {type(exc).__name__}: {exc}", file=sys.stderr)
    print(json.dumps({"tier": args.out, "copies": args.copies, "sec": times}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
