#!/usr/bin/env python
"""End-to-end training-corpus curation pipeline on this engine.

The composed workflow a user of the reference would hand-roll as chained
MapReduce jobs, expressed as ONE lazy DataFrame plan (Catalyst sees the
whole pipeline and prunes/pushes across stage boundaries):

  1. quality gate  — length + uniqueness heuristics (llm.text shapes)
  2. exact dedup   — keep the lowest doc_id per normalized-text hash
  3. near dedup    — drop MinHash-LSH candidates verified Jaccard >= 0.9
  4. stratified sample — deterministic md5-threshold split per language
  5. write         — parquet partitioned by lang (partition pruning for
                     downstream readers)

Usage::

    python examples/curate_corpus.py SF_DIR OUTDIR [--master local[8]] \
        [--sample-rate 0.5]

Prints per-stage row counts so the funnel is auditable.

Declared, oracle-checked twins of this narrative: stages 1-2 + packing
= ``corpus_curate_pipeline``; stages 1-3 with full connected-component
near-dup = ``corpus_curate_neardup`` (llm/curation.py, llm/dedup.py).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mrs_mapreduce_spark.catalog import table  # noqa: E402
from mrs_mapreduce_spark.llm.dedup import shingles  # noqa: E402
from mrs_mapreduce_spark.session import get_session  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("outdir")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--sample-rate", type=float, default=0.5)
    args = ap.parse_args(argv)

    spark = get_session("curate-corpus", master=args.master)
    docs = table(spark, args.sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop very short docs and low-vocabulary spam
    words = F.split("text", " ")
    gated = (
        docs.withColumn("n_words", F.size(words))
        .withColumn("n_uniq", F.size(F.array_distinct(words)))
        .filter(
            (F.col("n_words") >= 20)
            & (F.col("n_uniq") / F.col("n_words") >= 0.3)
        )
    )
    n1 = gated.count()

    # 2. exact dedup: lowest doc_id survives per normalized hash
    h = F.md5(F.lower(F.trim(F.col("text"))))
    keep_exact = gated.groupBy(h.alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = gated.join(keep_exact, "doc_id", "semi")
    n2 = exact.count()

    # 3. near dedup: MinHash-LSH candidates verified by true Jaccard,
    #    higher doc_id of each >=0.9 pair dropped (greedy, deterministic)
    sh = shingles(exact).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        pairs.join(sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na")), "da")
        .join(sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb")), "db")
        .filter(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            >= 0.9
        )
    )
    near = exact.join(
        jac.select(F.col("db").alias("doc_id")).distinct(), "doc_id", "anti"
    )
    n3 = near.count()

    # 4. deterministic stratified sample per language
    thr = int(args.sample_rate * 2**32)
    bucket = F.conv(F.substring(F.md5(F.concat_ws("|", "lang", "doc_id")), 1, 8), 16, 10).cast("long")
    sampled = near.filter(bucket < thr)
    n4 = sampled.count()

    # 5. partitioned sink
    (
        sampled.select("doc_id", "lang", "source", "text")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(args.outdir)
    )
    print(
        f"input={n0} quality={n1} exact_dedup={n2} near_dedup={n3} "
        f"sampled={n4} -> {args.outdir}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
