"""Partitioned and bucketed storage layouts.

Capability parity: the reference's only layout control is "one bucket file
per (source, split)" (``mrs/bucket.py``); Spark's table layouts are the
scale-relevant superset — hive-style partition directories give partition
PRUNING (queries touch only matching directories) and bucketing gives
co-located, shuffle-free joins.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet sink (dir per partition value)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


@register(
    "sink_partitioned",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS cnt,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    survey="A4 (partitioned sink) + §4 partition pruning",
    scale="""
    The write lays one directory per o_orderstatus; the read-back filter
    becomes a PartitionFilter (asserted in tests) — the scan never opens
    non-matching directories. At 100 TB partition-by low-cardinality
    query keys (date, status, lang) is the single biggest scan-cost
    lever; high-cardinality keys belong in bucketing, not partitioning
    (small-files explosion).
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write partitioned by status, read back with a pruned scan."""
    orders = table(spark, sf_dir, "orders")
    target = tempfile.mkdtemp(prefix="mrs_sink_part_") + "/orders_by_status"
    write_partitioned(orders, target, ["o_orderstatus"])
    back = spark.read.parquet(target)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            pround(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: co-locates join/agg keys at write time.

    Two tables bucketed identically on the join key sort-merge-join with
    ZERO exchange (asserted in tests) — the write-time analogue of the
    reference pre-partitioning datasets with the same parter so a
    downstream reduce needs no re-shuffle.
    """
    spark = df.sparkSession
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist; clear both for idempotency
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    location = Path(warehouse.removeprefix("file:")) / table_name
    if location.exists():
        shutil.rmtree(location)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
