"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "suite_total", "value": <sum of baseline-shape seconds>,
   "unit": "sec", "queries": {...}, "sf": 0.1}

The four BASELINE.md shapes (q1_pricing_summary / q3_join_agg_topk /
events_window / wordcount) are timed exactly as the baseline measured them
(warmed run, collect()) so the driver's 2x gate compares like for like;
additional registry queries are reported informationally.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from mrs_mapreduce_spark.catalog import table  # noqa: E402
from mrs_mapreduce_spark.exprs import pround  # noqa: E402
from mrs_mapreduce_spark.registry import load_all  # noqa: E402
from mrs_mapreduce_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- the four BASELINE.md shapes, exactly as measured there ---------------


def q1_pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc"
            ),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_join_agg_topk(spark, sf_dir):
    # The segment filter keeps ~1/5 of orders, so the qualified
    # (o_orderkey, o_orderdate) set broadcasts and prunes lineitem BEFORE
    # its shuffle — the only exchange left is the ~1/5-size aggregation.
    # Measured 1.38s -> 0.82s at sf0.1 (baseline 0.835s). At cluster
    # scale flip to the shuffle join when the qualified-order set
    # exceeds the broadcast threshold; AQE makes that call at runtime.
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    bo = orders.join(
        F.broadcast(cust), cust.c_custkey == orders.o_custkey
    ).select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(bo), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
        .orderBy(F.desc("rev"))
        .limit(10)
    )


def events_window(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.select(
            "user_id",
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
            F.sum("value").over(w_cum).alias("cum"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
        .limit(10)
    )


def timed_runs(fn, *args, runs: int = 3, warmups: int = 1):
    """Warm ``warmups`` times, then ``runs`` timed collect()s (raw list)."""
    for _ in range(warmups):
        fn(*args).collect()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(*args).collect()
        times.append(time.perf_counter() - t0)
    return times


def timed(fn, *args, runs: int = 3, warmups: int = 1):
    """Warm ``warmups`` times, then median of ``runs`` timed collect()s."""
    times = timed_runs(fn, *args, runs=runs, warmups=warmups)
    return sorted(times)[len(times) // 2]


def timed_wordcount_rdd_runs(spark, sf_dir, runs: int = 3, warmups: int = 2):
    """RDD wordcount with in-mapper combining (the Mrs combiner done as a
    per-partition Counter): shuffles |vocab| pairs per partition instead
    of one pair per word occurrence — ~25% faster than the naive
    flatMap/map/reduceByKey at sf0.1, identical results."""
    from collections import Counter

    def count_part(rows):
        counts = Counter()
        for r in rows:
            counts.update(r[0].split())
        return counts.items()

    def run():
        rdd = (
            table(spark, sf_dir, "documents")
            .select("text")
            .rdd.mapPartitions(count_part)
            .reduceByKey(lambda a, b: a + b)
        )
        return rdd.takeOrdered(10, key=lambda kv: (-kv[1], kv[0]))

    # wordcount is a gated shape too: warm twice like timed(warmups=2)
    # so driver-side JIT/settle lands in untimed passes (BASELINE.md
    # round-6 drift note — its post-sweep settle was the largest of
    # the four)
    for _ in range(warmups):
        run()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return times


#: extra registry queries reported informationally (extension coverage)
EXTRA = [
    "window_frame",
    "dedup_exact",
    "dedup_minhash",
    "similarity_topk",
    "text_tfidf",
    "stream_session",
    "join_asof",
    "sql_api_q5",
    "tpch_q6",
    "tpch_q18",
    "iterative_kmeans_emb",
    "iterative_pagerank",
    "sketch_countmin",
    "sketch_hll",
    "join_salted",
    "join_bloom_pruned",
    "sink_bucketed_join",
    "multimodal_decode",
    "corpus_pack_contexts",
    "corpus_decontaminate",
    "text_bm25",
    "text_perplexity",
    "similarity_ivf_trained",
    "similarity_lsh_multiprobe",
    "events_rfm",
    # round-3b additions
    "dedup_substring",
    "dedup_semdedup",
    "join_dpp",
    "join_range_binned",
    "agg_bitmap_distinct",
    "text_entropy",
    "sample_weighted",
    # round-8 additions (witnesses, curation ops, real codecs)
    "similarity_recall_witness",
    "similarity_recall_ivf",
    "text_redact",
    "dedup_canonical",
    "text_bpe_encode",
    "multimodal_bmp_roundtrip",
    # round-8b additions (sketch / reconciliation / governance)
    "sketch_heavy_hitters",
    "table_diff",
    "table_diff_incremental",
    "agg_corr_matrix",
    "takedown_propagation",
    "agg_dp_release",
    # round-8c additions (estimation / stats / audit)
    "sketch_join_size",
    "sketch_hll_intersection",
    "feature_standardize",
    "events_concurrency",
    "scan_kanonymity",
    "join_asof_tolerance",
    "agg_ttest",
    # round-11 additions (soft dedup / diversity / boilerplate)
    "dedup_soft_weights",
    "corpus_diversity_sample",
    "corpus_boilerplate_strip",
    # round-13 addition (the persisted co-located shingle-set layout;
    # the timed cost INCLUDES the in-query bucketed write — no memo)
    "sink_bucketed_hsets",
]

#: per-query soft budgets at sf0.1 (seconds): BENCH_r03 medians x ~1.5
#: headroom for the documented ±30% host noise. A query over budget is
#: named in the JSON's "over_budget" list — the regression alarm for the
#: expensive family (r3 verdict task: catch regressions by number, not
#: anecdote). dedup_semdedup's budget reflects the round-4 corpus-scaled
#: k fix (was 5.29 s with fixed k=16 — the one r3 scale-killer).
BUDGETS = {
    "q1_pricing_summary": 0.85,
    "q3_join_agg_topk": 1.0,
    "events_window": 0.5,
    "wordcount": 0.65,
    "dedup_minhash": 1.9,
    "iterative_kmeans_emb": 2.2,
    "iterative_pagerank": 1.8,
    "join_bloom_pruned": 2.0,
    "sink_bucketed_join": 1.7,
    "text_bm25": 1.2,
    "text_perplexity": 2.2,
    # r8: same re-base as similarity_lsh_multiprobe below — the two
    # ANN model-build queries (codebook train + broadcast, multiple
    # jobs) spike 1.7-2.1x their medians on a warm/loaded host with no
    # code change (driver benches 0.91/1.02 s in r6/r7; today's spread
    # 1.02-2.1 s across seven same-code runs)
    "similarity_ivf_trained": 2.5,
    # r8: solo spread 1.05-1.60 s with NO code change since the r3
    # median (driver benches 0.73/0.83 s in r6/r7) — the old 1.5 ceiling
    # sat inside the documented +-30-40% host band for a ~1 s query and
    # tripped spuriously on a warm host; re-based like the other
    # ~1 s-class entries (BASELINE.md round-8 drift attribution)
    "similarity_lsh_multiprobe": 2.0,
    "events_rfm": 1.8,
    # r4b: k tracks the corpus AND assignment is two-level (O(n*sqrt k))
    # — at sf0.1 the extra model-build/checkpoint barriers cost ~1.5 s
    # over the flat-argmin plan, bought back 13x at the 10x synthetic
    # tier (78 s -> 5.9 s); the budget reflects the scaled design
    "dedup_semdedup": 4.5,
    "join_dpp": 1.4,
    "join_range_binned": 1.7,
    # r11 additions: ~2x observed sf0.1 medians. r12: soft_weights
    # recomputes the FULL component-labeling fixpoint every timed run
    # (no cross-query memo — optimization-round rule; an interim memo
    # was removed because a timed run must compute from the parquet
    # inputs). The honest cost fell 6.03 -> ~4.4 s via: shared
    # (doc, shingle-md5) checkpoint feeding signature + both verify
    # sides (4 subtree instances -> 1), band keys fused into the wide
    # signature row (one shuffle removed), neighborhood-min label
    # init (one propagation round removed), na free in the verify
    # aggregation (one sizes join removed), and explode-symmetrized
    # edges (pair pipeline runs once, not twice, into the cache).
    # r13: set-array verify (per-doc shingle-hash sets as one array row;
    # signatures a projection, verify two equi-joins + array_intersect)
    # took the honest solo median to ~3.2-3.5 s — re-based to ~2x that.
    "dedup_soft_weights": 7.0,
    "corpus_diversity_sample": 2.2,
    "corpus_boilerplate_strip": 1.2,
    # r13: solo median 3.0 s (bucketed write + full pair pipeline off
    # the persisted layout) x ~2 headroom like its family
    "sink_bucketed_hsets": 6.0,
}

#: r10 (verdict task #7): the 2x gate only watches sf0.1, so a
#: scale-killer that stays flat at 600k lineitem rows but goes
#: superlinear one decade up would first surface in a driver bench.
#: These budgets cover the 4 gated shapes at the synthetic sf1 tier
#: (scripts/synth_scale.py --out /tmp/sf1_synth, 10x-sf0.1 offset
#: copies) with the same x1.5-headroom discipline over measured
#: solo-run medians (BASELINE.md round-10). Selected automatically
#: when SPARK_GRAFT_SF_DIR points at an sf >= 1 tier; run via
#:   SPARK_GRAFT_SF_DIR=/tmp/sf1_synth SPARK_GRAFT_GATED_ONLY=1 \
#:   python bench.py
BUDGETS_SF1 = {
    "q1_pricing_summary": 1.0,   # measured median 0.64 s (r10 solo run)
    "q3_join_agg_topk": 1.75,    # measured median 1.15 s
    "events_window": 1.0,        # measured median 0.67 s
    "wordcount": 2.05,           # measured median 1.35 s
}


def _fingerprint(spark) -> dict:
    """Run-environment fingerprint (r9 verdict task #4): enough context
    to distinguish a uniform host-noise round from a code/config
    regression without solo-run archaeology — scheduler mode, memory,
    parallelism, and a hash over every session conf this engine sets."""
    import hashlib

    import pyspark

    from mrs_mapreduce_spark.session import BUILD_CONFS, RUNTIME_CONFS

    confs = {**BUILD_CONFS, **RUNTIME_CONFS}
    blob = ";".join(f"{k}={v}" for k, v in sorted(confs.items()))
    return {
        "scheduler_mode": spark.conf.get("spark.scheduler.mode", "FIFO"),
        "driver_memory": confs.get("spark.driver.memory"),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "confs_sha256": hashlib.sha256(blob.encode()).hexdigest()[:16],
        "pyspark": pyspark.__version__,
        "python": ".".join(map(str, sys.version_info[:3])),
    }


def main() -> None:
    spark = get_session("mrs-bench")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1].removesuffix("_synth"))
    registry = load_all()

    queries: dict[str, float] = {}
    spreads: dict[str, dict] = {}

    def gated(name: str, runs: list[float]) -> None:
        """Record a gated shape's median plus its raw min/median spread
        (task #4: a median sitting far above its own min flags an
        unsettled host; a tight spread that is still high flags code)."""
        srt = sorted(runs)
        queries[name] = srt[len(srt) // 2]
        spreads[name] = {
            "min": round(srt[0], 4),
            "median": round(srt[len(srt) // 2], 4),
            "runs": [round(t, 4) for t in runs],
        }

    # the four GATED shapes warm twice: q1 is the first query of a cold
    # JVM, and the round-5/6 drift investigation (BASELINE.md) showed
    # its single-warm median absorbs whatever JIT/host settle is left
    # over when the driver benches right after its correctness sweep —
    # a second untimed pass costs ~2 s total and removes that exposure
    # runs=5 (was 3) for the gated shapes only: the r9 driver bench
    # inflated uniformly ~1.30x (host noise, BASELINE.md round-10
    # attribution) and a median of 3 is one slow run away from a false
    # over_budget; a median of 5 costs ~2 s and absorbs it.
    gated(
        "q1_pricing_summary",
        timed_runs(q1_pricing_summary, spark, SF_DIR, runs=5, warmups=2),
    )
    gated(
        "q3_join_agg_topk",
        timed_runs(q3_join_agg_topk, spark, SF_DIR, runs=5, warmups=2),
    )
    gated(
        "events_window",
        timed_runs(events_window, spark, SF_DIR, runs=5, warmups=2),
    )
    gated("wordcount", timed_wordcount_rdd_runs(spark, SF_DIR, runs=5))

    baseline_total = sum(queries.values())

    # A/B + scale-tier runs time just the gated shapes (solo-JVM
    # attribution protocol, BASELINE.md round-10)
    if not os.environ.get("SPARK_GRAFT_GATED_ONLY"):
        for name in EXTRA:
            try:
                queries[name] = timed(registry[name].builder, spark, SF_DIR)
            except Exception:
                queries[name] = -1.0

    # budgets are calibrated per tier: sf0.1 (the driver's bench tier)
    # and the synthetic sf1 tier. Any OTHER tier runs unbudgeted —
    # gating sf10 against sf1 numbers would report a spurious
    # regression for every shape (review finding r10).
    if sf == 0.1:
        budgets = dict(BUDGETS)
    elif sf == 1.0:
        budgets = dict(BUDGETS_SF1)
    else:
        budgets = {}
    over_budget = sorted(
        k for k, v in queries.items()
        if v >= 0 and k in budgets and v > budgets[k]
    )
    # r11 (verdict task #1): BENCH_r10 recorded "parsed": null because the
    # single JSON line outgrew the driver's tail-capture window once
    # spreads+fingerprint were added — the front of the dict got sliced
    # off. Emit the full detail (EXTRA per-query map, spreads,
    # fingerprint) on a PRECEDING line and mirror it to a side file, and
    # keep the FINAL stdout line a compact driver-gated object (<~1.5 KB):
    # metric / value / gated-shape times / over_budget / sf.
    detail = {
        "detail": "bench_extra",
        "queries": {k: round(v, 4) for k, v in queries.items()},
        "spreads": spreads,
        "fingerprint": _fingerprint(spark),
        "sf": sf,
    }
    print(json.dumps(detail))
    try:
        side = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
        side.write_text(json.dumps(detail, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout: the stdout detail line still has it
    gated_names = ("q1_pricing_summary", "q3_join_agg_topk",
                   "events_window", "wordcount")
    # r13 (verdict task #2): the final line is self-describing — cpus /
    # master / shuffle_partitions prove the $SPARK_GRAFT_CPUS contract
    # took effect (the r12 `suspect_cpus_ignored` flag fired on a line
    # that omitted the core count), and per-shape MIN rides along as the
    # drift-robust statistic (min across cold-JVM runs varies far less
    # than the median on a noisy host). Additions only: metric / value /
    # unit / queries / over_budget / sf keep their exact keys and
    # meanings so every cross-round comparison holds.
    print(
        json.dumps(
            {
                "metric": "suite_total",
                "value": round(baseline_total, 4),
                "unit": "sec",
                "queries": {
                    k: round(queries[k], 4)
                    for k in gated_names if k in queries
                },
                "queries_min": {
                    k: spreads[k]["min"] for k in gated_names if k in spreads
                },
                "over_budget": over_budget,
                "sf": sf,
                "cpus": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                "shuffle_partitions": spark.conf.get(
                    "spark.sql.shuffle.partitions"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
