"""Sources and sinks.

Capability parity: ``mrs/job.py::Job.file_data`` (A1), ``Job.local_data``
(A2), ``mrs/fileformats.py`` writers (A4) — SURVEY.md §2.A. The reference
reads text files into ``(position, line)`` pairs and writes one part-file
per reduce split; here sources are columnar parquet scans planned by
Catalyst and sinks write one file per partition (the same contract).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 45.0 AND l_returnflag = 'R'
    """,
    survey="A1/B1/B2",
    scale="""
    Projection + predicate reach the parquet scan (PushedFilters / ReadSchema
    in .explain): at 100 TB only 4 of 11 columns are decoded and row groups
    whose min/max exclude the predicate are skipped entirely.
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected, filtered columnar scan with pushdown."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).filter((F.col("l_quantity") >= 45.0) & (F.col("l_returnflag") == "R"))


#: Deterministic literal rows for local_data (mirrors a master-side iterable).
_LOCAL_ROWS = [
    (0, "tokyo"),
    (1, "osaka"),
    (2, "provo"),
    (3, "orem"),
    (4, "lehi"),
    (5, "provo"),
]


@register(
    "local_data",
    oracle="""
    SELECT k, v FROM (VALUES
        (0, 'tokyo'), (1, 'osaka'), (2, 'provo'),
        (3, 'orem'), (4, 'lehi'), (5, 'provo')) AS t(k, v)
    """,
    survey="A2",
    scale="""
    Driver-side literals become a LocalRelation — no scan, no shuffle;
    Catalyst constant-folds against it. Only sane for small seed/dimension
    data; anything large belongs in a file-backed source.
    """,
)
def local_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Master-side in-memory pairs as a dataset (mrs Job.local_data)."""
    schema = StructType(
        [StructField("k", IntegerType()), StructField("v", StringType())]
    )
    return spark.createDataFrame(_LOCAL_ROWS, schema)


@register(
    "sink_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    survey="A4",
    scale="""
    write.parquet emits one file per partition (the reference's one
    part-file per reduce split, A4). At scale: partition count sized by AQE,
    zstd compression, and the round-trip read replans from footers — the
    sink is also a source.
    """,
)
def sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an aggregate to parquet, read it back (sink⇆source contract)."""
    out = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            pround(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    target = tempfile.mkdtemp(prefix="mrs_sink_") + "/orders_agg"
    out.write.mode("overwrite").parquet(target)
    return spark.read.parquet(target)


@register(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_orderstatus = 'F'
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderpriority LIKE '%H%'
      AND o_custkey IS NOT NULL
      AND (o_orderkey % 2 = 0 OR o_totalprice > 150000)
      AND NOT (o_totalprice < 60000 AND o_orderkey % 3 = 0)
    """,
    survey="B1 (predicate family: =, between, in, like, null, and/or/not)",
    scale="""
    Every conjunct here is pushdown-eligible; Catalyst splits the
    conjunction, pushes the sargable parts into the parquet scan
    (row-group min/max skipping) and evaluates the rest post-scan in
    codegen. Predicate order in source is irrelevant — the optimizer
    reorders by selectivity estimates.
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full predicate surface in one filter."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderpriority").like("%H%")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 150000))
        & ~((F.col("o_totalprice") < 60000) & (F.col("o_orderkey") % 3 == 0))
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        pround("o_totalprice", 2).alias("price"),
    )


@register(
    "scan_profile",
    oracle="""
    SELECT col,
           n_rows,
           n_null,
           n_distinct,
           round(vmin, 2) AS vmin,
           round(vmax, 2) AS vmax
    FROM (
      SELECT 'o_custkey' AS col,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
             CAST(min(o_custkey) AS DOUBLE) AS vmin,
             CAST(max(o_custkey) AS DOUBLE) AS vmax
      FROM orders
      UNION ALL
      SELECT 'o_totalprice',
             CAST(count(*) AS BIGINT),
             CAST(count(*) - count(o_totalprice) AS BIGINT),
             CAST(count(DISTINCT o_totalprice) AS BIGINT),
             CAST(min(o_totalprice) AS DOUBLE),
             CAST(max(o_totalprice) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(count(*) AS BIGINT),
             CAST(count(*) - count(o_orderstatus) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT),
             NULL, NULL
      FROM orders)
    """,
    survey="E (table profiling: per-column null/distinct/range in one pass)",
    scale="""
    The ingestion-gate profile every pipeline runs before trusting a new
    drop: one wide aggregate computes count/nulls/min/max for all
    columns in a single scan; the per-column exact count(DISTINCT)s are
    the expensive part — Spark plans the multi-distinct via Expand (one
    shuffle carrying |cols| replicas). At 100 TB swap the exact
    distincts for approx_count_distinct (HLL++, no Expand, one pass,
    ~2% error) — the builder keeps exact here because the driver oracle
    hashes values. The unpivot to (col, stat) rows is a driver-side
    relational reshape of an already-1-row result: free.
    """,
)
def scan_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (rows/nulls/distinct/range) of orders in one scan."""
    o = table(spark, sf_dir, "orders")
    wide = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_ck"),
        F.count_distinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("double").alias("min_ck"),
        F.max("o_custkey").cast("double").alias("max_ck"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("null_tp"),
        F.count_distinct("o_totalprice").alias("nd_tp"),
        F.min("o_totalprice").cast("double").alias("min_tp"),
        F.max("o_totalprice").cast("double").alias("max_tp"),
        (F.count(F.lit(1)) - F.count("o_orderstatus")).alias("null_os"),
        F.count_distinct("o_orderstatus").alias("nd_os"),
    )
    return wide.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_custkey").alias("col"),
                    F.col("n_rows"),
                    F.col("null_ck").alias("n_null"),
                    F.col("nd_ck").alias("n_distinct"),
                    pround("min_ck", 2).alias("vmin"),
                    pround("max_ck", 2).alias("vmax"),
                ),
                F.struct(
                    F.lit("o_totalprice").alias("col"),
                    F.col("n_rows"),
                    F.col("null_tp").alias("n_null"),
                    F.col("nd_tp").alias("n_distinct"),
                    pround("min_tp", 2).alias("vmin"),
                    pround("max_tp", 2).alias("vmax"),
                ),
                F.struct(
                    F.lit("o_orderstatus").alias("col"),
                    F.col("n_rows"),
                    F.col("null_os").alias("n_null"),
                    F.col("nd_os").alias("n_distinct"),
                    F.lit(None).cast("double").alias("vmin"),
                    F.lit(None).cast("double").alias("vmax"),
                ),
            )
        ).alias("p")
    ).select("p.*")
