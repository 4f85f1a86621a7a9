"""Iterative driver-loop algorithms.

Capability parity: ``mrs/__init__.py::IterativeMR`` (A12) — the reference's
raison d'être: per-iteration datasets produced by a driver loop with
``job.wait``. In Spark the idiom is a plain Python loop over cached
DataFrames: small model state (centroids) lives on the driver, the big
relation stays distributed and cached, and each iteration is one job.

Declared query: a deterministic 1-D k-means (k=4, 3 assignment rounds) on
``customer.c_acctbal``. Determinism discipline: centroids are rounded to 6
decimals after every update ON BOTH SIDES, so Spark and the unrolled-SQL
oracle assign points against bit-identical centroids; ties break to the
lowest cluster index in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register

_K = 4
_ROUNDS = 3  # assignment rounds; centroid updates happen after rounds 1..2


def _assign_expr(centroids: list[tuple[int, float]]):
    """argmin_i |x - c_i| with ties to the lowest i (strict < keeps first)."""
    best_k = F.lit(centroids[0][0])
    best_d = F.abs(F.col("x") - F.lit(centroids[0][1]))
    for i, c in centroids[1:]:
        d = F.abs(F.col("x") - F.lit(c))
        closer = d < best_d
        best_k = F.when(closer, F.lit(i)).otherwise(best_k)
        best_d = F.when(closer, d).otherwise(best_d)
    return best_k


@register(
    "iterative_converge",
    oracle="""
    WITH b AS (SELECT c_custkey AS key, c_acctbal AS x FROM customer),
    s AS (SELECT min(x) AS mn, max(x) AS mx FROM b),
    c0 AS (SELECT i, mn + (i + 0.5) * (mx - mn) / 4 AS c
           FROM s CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)),
    a1 AS (SELECT key, x, i,
                  row_number() OVER (PARTITION BY key
                                     ORDER BY abs(x - c), i) AS rn
           FROM b CROSS JOIN c0),
    c1 AS (SELECT i, round(avg(x), 6) AS c FROM a1 WHERE rn = 1 GROUP BY i),
    a2 AS (SELECT key, x, i,
                  row_number() OVER (PARTITION BY key
                                     ORDER BY abs(x - c), i) AS rn
           FROM b CROSS JOIN c1),
    c2 AS (SELECT i, round(avg(x), 6) AS c FROM a2 WHERE rn = 1 GROUP BY i),
    a3 AS (SELECT key, x, i,
                  row_number() OVER (PARTITION BY key
                                     ORDER BY abs(x - c), i) AS rn
           FROM b CROSS JOIN c2)
    SELECT i AS cluster, count(*) AS n, round(avg(x), 2) AS centroid
    FROM a3 WHERE rn = 1 GROUP BY i
    """,
    survey="A12 (IterativeMR parity)",
    scale="""
    The IterativeMR pattern at scale: the point set stays cached and
    distributed; only k floats round-trip through the driver per
    iteration (no collect of data). cache() + per-generation unpersist and
    periodic localCheckpoint bound lineage growth — the exact failure mode
    (per-iteration overhead) Mrs was built to avoid in Hadoop.
    """,
)
def iterative_converge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D k-means via the IterativeMR driver-loop idiom."""
    pts = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("x"))
        .cache()
    )
    stats = pts.agg(F.min("x").alias("mn"), F.max("x").alias("mx")).first()
    mn, mx = stats.mn, stats.mx
    centroids = [(i, mn + (i + 0.5) * (mx - mn) / 4) for i in range(_K)]

    assigned = None
    for round_no in range(1, _ROUNDS + 1):
        assigned = pts.withColumn("k", _assign_expr(centroids))
        if round_no < _ROUNDS:
            rows = (
                assigned.groupBy("k")
                .agg(pround(F.avg("x"), 6).alias("c"))
                .collect()
            )
            centroids = sorted((r.k, r.c) for r in rows)

    return assigned.groupBy(F.col("k").alias("cluster")).agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.avg("x"), 2).alias("centroid"),
    )
