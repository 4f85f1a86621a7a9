#!/usr/bin/env python
"""Corpus search: inverted-index AND query with tf-idf ranking.

The retrieval workflow behind `text_postings`/`text_tfidf`, composed as
one lazy DataFrame plan:

  1. posting build — explode documents.text to (term, doc_id, tf)
  2. AND semantics — keep docs matching ALL query terms (count of
     matched distinct terms == |query|; an anti-pattern-free alternative
     to N chained joins)
  3. rank — sum over query terms of tf * idf, idf from a broadcast
     |query|-row document-frequency relation
  4. top-k — TakeOrderedAndProject, never a global sort

Usage::

    python examples/search_corpus.py SF_DIR term1 [term2 ...] \
        [--master local[8]] [--top 10]

At 100 TB the posting build is the only corpus-sized stage (one shuffle
keyed by term, Zipf-skew note in SCALE.md); the query side is always
broadcast-sized.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def search(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str],
    top: int = 10,
    bm25: bool = False,
) -> DataFrame:
    """Top-``top`` docs containing ALL ``terms``, tf-idf or BM25 ranked."""
    from mrs_mapreduce_spark.catalog import fan_out, table

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    terms = sorted(set(terms))

    tok = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    tf = (
        tok.filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_rel = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    if bm25:
        # Okapi BM25 (k1=1.2, b=0.75) — the llm.text.text_bm25 formula
        k1, b = 1.2, 0.75
        dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
        avgdl = dl.agg(F.avg("dl").alias("avgdl"))
        idf = df_rel.select(
            "w",
            F.log(
                (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ).alias("idf"),
        )
        per_term = (
            tf.join(F.broadcast(idf), "w")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(avgdl))
            .select(
                "doc_id",
                "w",
                (
                    F.col("idf")
                    * (F.col("tf") * (k1 + 1.0))
                    / (
                        F.col("tf")
                        + k1
                        * ((1.0 - b) + b * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("s"),
            )
        )
    else:
        idf = df_rel.select(
            "w",
            F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)).alias("idf"),
        )
        per_term = tf.join(F.broadcast(idf), "w").select(
            "doc_id", "w", (F.col("tf") * F.col("idf")).alias("s")
        )
    scored = (
        per_term.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum("s"), 4).alias("score"),
        )
        .filter(F.col("n_matched") == len(terms))  # AND semantics
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(top)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("sf_dir")
    parser.add_argument("terms", nargs="+")
    parser.add_argument("--master", default=None)
    parser.add_argument("--top", type=int, default=10)
    parser.add_argument(
        "--bm25", action="store_true", help="rank with Okapi BM25"
    )
    args = parser.parse_args()

    from mrs_mapreduce_spark.session import get_session

    spark = get_session("search_corpus", master=args.master)
    result = search(spark, args.sf_dir, args.terms, args.top, bm25=args.bm25)
    for row in result.collect():
        print(f"doc {row.doc_id:>8}  score={row.score:<10} "
              f"matched={row.n_matched}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
