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
import os
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
    "dedup_minhash_eval",
    "dedup_substring",
    "dedup_semdedup",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_simblocked",
    "dedup_jaccard_exact",
    "dedup_containment",
    "dedup_against_corpus_minhash",
    "dedup_embedding",
    "dedup_components",
    "dedup_components_star",
    "dedup_soft_weights",
    "text_perplexity",
    "text_bm25",
    "text_tfidf",
    "text_bpe_train",
    "text_winnow_fingerprint",
    "similarity_ivf_trained",
    "similarity_ivf_nprobe",
    "similarity_ivf_adc",
    "similarity_lsh_multiprobe",
    "sink_lsh_index",
    "iterative_pagerank",
    "graph_triangles",
    "events_rfm",
    "events_session_ids",
    "window_frame",
    "sketch_countmin",
    "sketch_countmin_merge",
    "sketch_quantile",
    "corpus_decontaminate",
    "corpus_pack_contexts",
    "corpus_curate_pipeline",
    "corpus_curate_neardup",
    "stream_ewma_state",
    # round-8 additions
    "similarity_recall_witness",
    "text_bpe_encode",
    "text_redact",
    "dedup_canonical",
    "multimodal_bmp_roundtrip",
    "multimodal_wav_roundtrip",
    "similarity_recall_ivf",
    "stream_join_inner",
    "sketch_heavy_hitters",
    "table_diff",
    "table_diff_incremental",
    "agg_corr_matrix",
    "takedown_propagation",
    "agg_dp_release",
    "sketch_join_size",
    "feature_standardize",
    "stream_join_full_outer",
    "events_concurrency",
    "sketch_hll_intersection",
    "scan_kanonymity",
    "join_asof_tolerance",
    "agg_ttest",
    "agg_chi2",
    "sample_split",
    "stream_join_right_outer",
]

#: ``--check`` regression gate (round-5, r4 verdict #6): pinned ceilings
#: on the per-query time ratio t(synthetic tier) / t(sf0.1). With the
#: default 10 copies, at-worst-linear work is ratio <= ~10; budgets are
#: ~2x the ratio measured in the SCALE.md sweeps (host noise is
#: documented at +-30%, and sub-second sf0.1 denominators are floored at
#: 0.3 s), so a pass means "no NEW superlinear term", not "fast today".
#: Output-bound replica artifacts (the pair lists whose TRUE result
#: grows ~100x when every doc gains 9 identical twins) carry explicitly
#: larger budgets with the reason inline.
RATIO_BUDGETS = {
    "q1": 8,
    "q3": 9,
    "dedup_minhash": 7,
    "dedup_minhash_pairs": 18,  # output-bound: true pairs ~100x on replicas
    "dedup_substring": 6,
    "dedup_semdedup": 6,
    "dedup_ngram_jaccard": 8,  # output-bound tail; r5 re-block measured 3.3x
    "dedup_ngram_jaccard_simblocked": 80,  # output-bound: 102x pair growth
    # prefix-filter joins, copy-collapsed (r6): 1.0x at 10 copies /
    # 14.6 s + 9.2 s at 100 copies (27M / 55M true output rows) after
    # the exact-copy collapse; uncollapsed they measured 2.3x / 3.5x at
    # 10 copies and 279 s / disk-death at 100. Residual quadratic is
    # NEAR-dup (not exact-dup) mass — the headroom over 1.0x covers it
    "dedup_jaccard_exact": 6,
    "dedup_containment": 6,
    # batch side is ~the whole replica tier (split is doc_id>=250):
    # linear signature/band work over the batch + a batch x 250-doc
    # corpus probe; output grows with batch copies of corpus texts
    "dedup_against_corpus_minhash": 8,
    # collapsed like _pairs; output = candidate pairs (quadratic in
    # replicas by contract), generated through the expansion explode
    "dedup_minhash_eval": 8,
    "dedup_embedding": 7,  # r5 re-block measured 2.8x
    # components run over collapsed edges (exact-dup mass as rep->copy
    # stars): r5 measured 20.3 s at 10 copies / 27.0 s at 100 copies
    # (was 602 s uncollapsed at 100) — linear star mass + constant
    # distinct-content pair work
    "dedup_components": 8,
    "dedup_components_star": 8,
    # shares the collapsed labeling pipeline with dedup_components —
    # same linear star mass; the weight join is label-mass-sized (r12)
    "dedup_soft_weights": 8,
    "text_perplexity": 11,
    "text_bm25": 11,
    "text_tfidf": 10,
    # one scan + per-doc windows; output bounded by the doc_id<100 cut
    "text_winnow_fingerprint": 6,
    # corpus-sized stage is the word histogram; rounds are vocab-bounded
    # (replica tiers multiply counts, not vocab) — near-flat by design
    "text_bpe_train": 6,
    "similarity_ivf_trained": 6,
    # nprobe=2 doubles per-query candidates but cells track the corpus
    "similarity_ivf_nprobe": 6,
    # ADC scores the probed cell off the 32x-smaller codes relation
    "similarity_ivf_adc": 6,
    "similarity_lsh_multiprobe": 6,
    # index stays corpus-sized (250 docs at every tier); batch bands +
    # the one batch-side shuffle grow linearly, output is bucket hits
    "sink_lsh_index": 8,
    # r5: hard broadcast hints removed from their scaling edge builds
    # (AQE now picks the strategy) — gate that the unhinted plans stay
    # linear-ish at 10x
    "iterative_pagerank": 6,
    "graph_triangles": 6,
    "events_rfm": 7,
    "events_session_ids": 6,
    "window_frame": 6,
    "sketch_countmin": 6,
    # same fan-out + one shard column; every aggregate map-side combined
    "sketch_countmin_merge": 6,
    "sketch_quantile": 6,
    "corpus_decontaminate": 6,
    "corpus_pack_contexts": 7,
    # filter + hash-dedup + pack: every stage linear, one extra id-keyed
    # semi-join over pack alone
    "corpus_curate_pipeline": 8,
    # filter shrinks the pair problem before pairwise work; components
    # run over collapsed edges of the filtered set + pack
    "corpus_curate_neardup": 10,
    # stateful stream: rows scale 10x, state O(live keys); availableNow
    # micro-batch overhead dominates the small denominators
    "stream_ewma_state": 8,
    # exact side scans the corpus once per plan (broadcast query set of
    # 10); approx side is bucket-joined — both linear in replicas
    "similarity_recall_witness": 6,
    # same histogram collapse as text_bpe_train + a vocab-bounded final
    # agg; replica tiers multiply counts, never vocab
    "text_bpe_encode": 6,
    # pure narrow codegen regexp map, no shuffle
    "text_redact": 6,
    # one hash groupBy over the 1.34x-spliced relation
    "dedup_canonical": 6,
    # narrow Arrow stages, per-row constant work
    "multimodal_bmp_roundtrip": 6,
    "multimodal_wav_roundtrip": 6,
    # exact side linear scan; approx side = the nprobe cell equijoin
    "similarity_recall_ivf": 6,
    # dual-stream state O(rate x interval); micro-batch overhead
    # dominates the sf0.1 denominator like stream_ewma_state
    "stream_join_inner": 8,
    # per-segment counts partial-aggregate; summary bounded at S*k rows;
    # replica tiers multiply counts, never the bigram vocabulary
    "sketch_heavy_hitters": 6,
    # two narrow (key, fingerprint) scans + one full outer SMJ, linear
    "table_diff": 6,
    # digest phase is two partial-aggregated sums; row phase touches
    # only dirty buckets (delta density is replica-invariant)
    "table_diff_incremental": 6,
    # one scan, 6 algebraic aggregates, one state-row exchange
    "agg_corr_matrix": 6,
    # broadcast anti-join per artifact + partial-aggregated counting;
    # the postings distinct is the only shuffle that grows with data
    "takedown_propagation": 6,
    # groupBy + a |groups|-row noise projection
    "agg_dp_release": 6,
    # two 1024-row sketches from per-key counts; truth joins aggregates
    "sketch_join_size": 6,
    # one stats aggregate + broadcast-join projection + final re-agg
    "feature_standardize": 6,
    # dual-stream state O(rate x interval); micro-batch overhead
    # dominates the sf0.1 denominator like stream_join_inner
    "stream_join_full_outer": 8,
    # one session window + day-partitioned sweeps; points = 2 x segments
    "events_concurrency": 6,
    # three 64-row register aggregations + one exact intersect witness
    "sketch_hll_intersection": 6,
    # one groupBy over quasi-identifiers + a |groups|-row audit agg
    "scan_kanonymity": 6,
    # join_asof_nearest's one-shuffle shared-frame plan + a CASE
    "join_asof_tolerance": 6,
    # one conditional-aggregation pass, single state row on the wire
    "agg_ttest": 6,
    # one groupBy to the contingency table; margins over ~35 rows
    "agg_chi2": 6,
    # codegen split projection + one partial-aggregated manifest groupBy
    "sample_split": 6,
    # dual-stream state like its siblings; micro-batch overhead dominates
    "stream_join_right_outer": 8,
}

#: floor for the sf0.1 denominator: sub-0.3 s timings are scheduler
#: noise at local[32] and would make healthy ratios look superlinear
_MIN_BASE_SEC = 0.3


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
        # one scan x a broadcast copy-index dim, NOT a copies-way union:
        # the union plan grows one scan node per copy (fine at 10,
        # pathological at 1000 — the round-5 sf100 tier), while this
        # shape is O(1) plan nodes at any copy count
        #
        # LAYOUT MATTERS AS MUCH AS ROWS: the first sf100 tier inherited
        # the source's 1-2 partitions through the crossJoin, so zstd
        # packed 5M replicated docs into ONE parquet row group — and a
        # row group is the scan split unit, so every downstream
        # documents scan ran as 1 task no matter what the query's plan
        # said (serialized scans masquerading as superlinear queries:
        # pack_contexts 13.5x, bm25 17x for 10x rows; all reproduced
        # linear after the re-layout). Repartition the SOURCE before
        # the crossJoin — each task then generates and writes its own
        # bounded file (~300k rows/row group), no post-replication
        # shuffle, and scan parallelism matches what any real writer
        # (this engine's own sinks included) would produce at that
        # volume.
        n_src = df.count()
        nparts = max(32, min(1024, (n_src * copies) // 300_000))
        rep = df.repartition(nparts).crossJoin(
            F.broadcast(spark.range(copies).select(F.col("id").alias("__copy")))
        )
        for c in cols:
            rep = rep.withColumn(
                c,
                (
                    F.col(c) + F.col("__copy") * F.lit(strides[STRIDE_OF[c]])
                ).cast("long"),
            )
        u = rep.drop("__copy").select(*df.columns)
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
    ap.add_argument(
        "--check",
        action="store_true",
        help="regression gate: time each query at sf0.1 AND the synthetic"
        " tier, fail (exit 1) if any ratio exceeds its RATIO_BUDGETS"
        " ceiling — catches a newly-introduced superlinear term"
        " automatically instead of by reading sweep tables",
    )
    args = ap.parse_args(argv)

    # Tier sessions model a PROVISIONED fleet, not the driver-gate box:
    # the fixture config (32 shuffle partitions, 16g) is sized for
    # sf<=0.1, where AQE coalescing keeps partitions sane. At 100-1000x
    # the fixtures a 600M-row sort split 32 ways is 18M rows per task —
    # the local JVM's execution pool can't hold 32 such sorters
    # (measured: q3 UNABLE_TO_ACQUIRE_MEMORY at the 1000-copy tier).
    # Apply SCALE.md's own cluster recipe: shuffle partitions ~3x cores
    # (AQE still coalesces the small-scale denominator runs), heap
    # sized like a real executor fleet's aggregate share.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_session(
        "synth-scale",
        extra={
            "spark.sql.shuffle.partitions": str(3 * cpus),
            # broadcast builds funnel through the driver (collect ->
            # rebroadcast); the 1g default result cap aborts tier-sized
            # builds a fleet driver would take in stride
            "spark.driver.maxResultSize": "8g",
        },
    )
    if not args.skip_build:
        build(spark, args.out, args.copies)

    registry = load_all()
    if args.all:
        wanted = sorted(registry)
    else:
        wanted = args.queries.split(",") if args.queries else HEAVY
    times = {}
    over: list[str] = []
    if args.check:
        # warm the session (JIT, codegen, parquet footer caches) before
        # any timed run: the first query of a fresh session pays ~3-5 s
        # of one-time cost, which lands in the sf0.1 DENOMINATOR and can
        # halve a true quadratic's measured ratio below its budget
        for spec in wanted[:1]:
            _, _, wname = spec.partition(":")
            registry[wname or spec].builder(spark, SRC).count()
    for spec in wanted:
        label, _, name = spec.partition(":")
        name = name or label
        try:
            base = None
            if args.check:
                t0 = time.perf_counter()
                registry[name].builder(spark, SRC).count()
                base = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = registry[name].builder(spark, args.out).count()
            dt = time.perf_counter() - t0
            times[label] = round(dt, 3)
            if args.check:
                ratio = dt / max(base, _MIN_BASE_SEC)
                budget = RATIO_BUDGETS.get(label)
                verdict = ""
                if budget is not None and ratio > budget:
                    over.append(label)
                    verdict = f"  ** OVER BUDGET ({budget}x) **"
                print(
                    f"[check] {label}: sf0.1={base:.2f}s tier={dt:.2f}s"
                    f" ratio={ratio:.1f}x{verdict}",
                    file=sys.stderr,
                )
            else:
                print(f"[ran] {label}: {dt:.2f}s rows={n}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            times[label] = -1.0
            if args.check:
                over.append(label)
            print(f"[ERR] {label}: {type(exc).__name__}: {exc}", file=sys.stderr)
    out = {"tier": args.out, "copies": args.copies, "sec": times}
    if args.check:
        out["over_budget"] = over
    print(json.dumps(out))
    return 1 if over else 0


if __name__ == "__main__":
    sys.exit(main())
