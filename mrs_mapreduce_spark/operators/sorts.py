"""Global sort, limit and top-k.

Capability parity: SURVEY.md §2.B B16/B17. Mrs has only hash/mod
partitioners, so a global sort means one reducer; Spark's orderBy samples
the key distribution and range-partitions (a true parallel sort), and
``orderBy().limit(k)`` compiles to TakeOrderedAndProject — per-partition
heaps merged on the driver, the distributed form of the reference's
single-reducer-with-heap top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "sort_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price, rn
    FROM (SELECT o_orderkey, o_totalprice,
                 row_number() OVER (ORDER BY o_totalprice DESC,
                                    o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 100
    """,
    survey="B16",
    scale="""
    Global rank positions WITHOUT a single-partition window over all rows:
    orderBy().limit(k) prunes to k rows via TakeOrderedAndProject first,
    and only those k pass through the one-partition row_number window.
    Same output as ranking the full table, but the single-task section
    touches k rows instead of 100 TB.
    """,
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global sort with explicit rank positions."""
    orders = table(spark, sf_dir, "orders")
    top = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
    w = Window.orderBy(F.desc("o_totalprice"), "o_orderkey")
    return top.select(
        "o_orderkey",
        pround("o_totalprice", 2).alias("price"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    survey="B17",
    scale="""
    TakeOrderedAndProject: each task keeps a k-element heap; the driver
    merges #partitions * k candidates. O(n) scan, no shuffle, no global
    sort — the only acceptable top-k plan at 100 TB.
    """,
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with a deterministic tiebreak."""
    li = table(spark, sf_dir, "lineitem")
    return (
        # order by the RAW price, round only in the projection: the
        # oracle's LIMIT selects by raw l_extendedprice, so ranking the
        # rounded value could pick a different top-10 SET whenever two
        # distinct raws round to the same cents (r11 sorts review;
        # sort_global in this file already does it this way)
        li.orderBy(
            F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
        )
        .limit(10)
        .select(
            "l_orderkey",
            "l_linenumber",
            pround("l_extendedprice", 2).alias("price"),
        )
    )


@register(
    "topk_pergroup",
    oracle="""
    SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price, rk
    FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC,
                                    o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3
    """,
    survey="B17 (grouped top-k)",
    scale="""
    Per-group top-k via ranked window + filter: one shuffle on the group
    key. Catalyst inserts a WindowGroupLimit (rank-limit pushdown) so each
    task keeps only k rows per group BEFORE the shuffle — the map-side
    combine of top-k.
    """,
)
def topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price within each order status."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.select(
            "o_orderstatus",
            "o_orderkey",
            pround("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )
