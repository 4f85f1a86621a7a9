#!/usr/bin/env python
"""The full modern pretraining-data pipeline, end to end on this engine.

Composes the round-3 LLM-curation operators into the chain a production
corpus actually runs, as ONE auditable job:

  1. quality gate       — length / uniqueness heuristics (llm.text)
  2. LM perplexity gate — drop the worst-scoring tail under the corpus
                          bigram LM (text_perplexity's shape)
  3. exact dedup        — earliest doc per normalized content hash
  4. near dedup         — MinHash-LSH clusters via alternating-star
                          components; keep each cluster's min doc
  5. decontamination    — drop docs sharing shingles with a benchmark
                          set (broadcast semi-join)
  6. temperature mix    — per-language sampling rates p ∝ share^0.7,
                          applied as deterministic md5-threshold
                          sampling per language
  7. sink               — parquet partitioned by lang

Prints one funnel line per stage so the whole reduction is auditable.

Usage::

    python examples/pretrain_pipeline.py SF_DIR OUTDIR [--master local[8]]
        [--ppl-cut 0.9] [--tau 0.7]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mrs_mapreduce_spark.catalog import table  # noqa: E402
from mrs_mapreduce_spark.llm.dedup import (  # noqa: E402
    shingles,
    star_components,
)
from mrs_mapreduce_spark.session import get_session  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("outdir")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument(
        "--ppl-cut", type=float, default=0.9,
        help="keep docs below this avg-nll quantile (higher = laxer)",
    )
    ap.add_argument("--tau", type=float, default=0.7)
    args = ap.parse_args(argv)

    spark = get_session("pretrain-pipeline", master=args.master)
    docs = table(spark, args.sf_dir, "documents")
    funnel = [("raw", docs.count())]

    # 1. quality gate
    words = F.split("text", " ")
    gated = (
        docs.withColumn("n_words", F.size(words))
        .withColumn("n_uniq", F.size(F.array_distinct(words)))
        .filter(
            (F.col("n_words") >= 20)
            & (F.col("n_uniq") / F.col("n_words") >= 0.3)
        )
        .drop("n_words", "n_uniq")
    )
    funnel.append(("quality_gate", gated.count()))

    # 1b. entropy gate: drop low-diversity / boilerplate docs (unigram
    #     Shannon entropy via the algebraic decomposition — text_entropy)
    tf = (
        gated.select("doc_id", F.explode(words).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ent = tf.groupBy("doc_id").agg(
        (
            F.log2(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c").cast("double")
        ).alias("h")
    )
    gated = gated.join(
        ent.filter(F.col("h") >= 2.0).select("doc_id"), "doc_id", "semi"
    )
    funnel.append(("entropy_gate", gated.count()))

    # 2. perplexity gate: avg bigram nll under the corpus LM; keep the
    #    docs below the --ppl-cut quantile (worst tail dropped)
    bg = shingles(gated, k=2).select("doc_id", F.col("sh").alias("pair"))
    pairs = bg.groupBy("pair").agg(F.count(F.lit(1)).alias("c12"))
    uni = pairs.groupBy(F.split("pair", " ").getItem(0).alias("w1")).agg(
        F.sum("c12").alias("c1")
    )
    vocab = (
        gated.select(F.explode(words).alias("w"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )
    nll = -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))
    scored = (
        bg.join(pairs, "pair")
        .withColumn("w1", F.split("pair", " ").getItem(0))
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.avg(nll).alias("avg_nll"))
    )
    cut = scored.agg(
        F.expr(f"percentile_approx(avg_nll, {args.ppl_cut}, 10000)").alias(
            "cut"
        )
    )
    fluent = gated.join(
        scored.crossJoin(F.broadcast(cut)).filter(
            F.col("avg_nll") <= F.col("cut")
        ).select("doc_id"),
        "doc_id",
        "semi",
    )
    funnel.append(("perplexity_gate", fluent.count()))

    # 3. exact dedup
    h = F.md5(F.lower(F.trim(F.col("text"))))
    keep = fluent.groupBy(h.alias("h")).agg(F.min("doc_id").alias("doc_id"))
    exact = fluent.join(keep.select("doc_id"), "doc_id", "semi")
    funnel.append(("exact_dedup", exact.count()))

    # 3b. exact-substring gate (dedup_substring): drop docs whose 8-gram
    #     stream is mostly duplicated across OTHER surviving docs —
    #     catches long copied spans exact/near dedup both miss
    from pyspark.sql.window import Window as _W

    g8 = shingles(exact, k=8).select("doc_id", F.md5("sh").alias("h8"))
    per = g8.groupBy("doc_id", "h8").agg(F.count(F.lit(1)).alias("c"))
    per = per.withColumn(
        "nd", F.count(F.lit(1)).over(_W.partitionBy("h8"))
    )
    ratio = per.groupBy("doc_id").agg(
        (
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(0))
            / F.sum("c")
        ).alias("r")
    )
    exact = exact.join(
        ratio.filter(F.col("r") >= 0.8).select("doc_id"), "doc_id", "anti"
    )
    funnel.append(("substring_dedup", exact.count()))

    # 4. near dedup: shingle-overlap candidate pairs -> alternating-star
    #    components -> keep each cluster's min doc_id
    sh = shingles(exact).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    near_pairs = (
        cand.join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("nb")), "doc_b")
        .filter(
            F.col("inter")
            / (F.col("na") + F.col("nb") - F.col("inter")) >= 0.9
        )
        .select("doc_a", "doc_b")
    )
    sym = near_pairs.union(
        near_pairs.select(F.col("doc_b").alias("doc_a"),
                          F.col("doc_a").alias("doc_b"))
    )
    if sym.take(1):
        labels = star_components(sym)
        drop = labels.filter(F.col("doc_id") != F.col("lbl")).select(
            "doc_id"
        )
        near = exact.join(drop, "doc_id", "anti")
    else:
        near = exact
    funnel.append(("near_dedup", near.count()))

    # 5. decontamination: benchmark = first 5 docs' shingles (stand-in
    #    for an eval set), broadcast semi-probe
    bench = shingles(
        table(spark, args.sf_dir, "documents").filter(F.col("doc_id") < 5)
    ).select("sh").distinct()
    contaminated = (
        shingles(near).join(F.broadcast(bench), "sh").select("doc_id")
        .distinct()
    )
    clean = near.join(contaminated, "doc_id", "anti")
    funnel.append(("decontaminated", clean.count()))

    # 6. temperature-scaled per-language sampling (p ∝ share^tau),
    #    deterministic md5-threshold acceptance
    lt = clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = lt.agg(F.sum("n").alias("total"))
    rates = (
        lt.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n") / F.col("total"))
        .withColumn("w", F.pow("share", args.tau))
    )
    z = rates.agg(F.sum("w").alias("z"))
    rates = (
        rates.crossJoin(F.broadcast(z))
        .withColumn("p", F.col("w") / F.col("z"))
        # acceptance rate per lang, scaled so no lang exceeds 1.0
        .withColumn("rate", F.least(F.lit(1.0),
                                    F.col("p") / F.col("share")))
        .select("lang", "rate")
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7),
               16, 10).cast("double") / float(16**7)
    sampled = (
        clean.join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .drop("rate")
    )
    funnel.append(("temperature_sampled", sampled.count()))

    # 7. partitioned sink
    sampled.write.mode("overwrite").partitionBy("lang").parquet(args.outdir)
    for stage, n in funnel:
        print(f"{stage:>20}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
