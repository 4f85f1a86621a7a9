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
