"""Set operations: union, intersect, except.

Capability parity: SURVEY.md §2.B B18/B19. Multi-file ``file_data`` is the
reference's union (A1); intersect/except are reduce-side side-presence
checks a Mrs user writes by hand. Here they are native operators that
compile to union / left-semi-style aggregation plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "set_union",
    oracle="""
    SELECT c_custkey AS id, 'cust' AS side, round(c_acctbal, 2) AS bal
    FROM customer
    UNION ALL
    SELECT s_suppkey AS id, 'supp' AS side, round(s_acctbal, 2) AS bal
    FROM supplier
    """,
    survey="B18",
    scale="""
    unionByName is a metadata concat — zero shuffle, partitions of both
    children are simply appended. Row-count additivity is tested as a
    hypothesis property.
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union of two entity tables."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.lit("cust").alias("side"),
        pround("c_acctbal", 2).alias("bal"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.lit("supp").alias("side"),
        pround("s_acctbal", 2).alias("bal"),
    )
    return cust.unionByName(supp)


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    survey="B19",
    scale="""
    INTERSECT compiles to a left-semi join over distinct keys — one
    shuffle per side on the compared columns.
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers present in both order-status populations."""
    orders = table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    survey="B19",
    scale="""
    EXCEPT ALL preserves multiplicity (bag semantics): implemented as a
    counted anti-subtraction — per-key counts on both sides, emit
    max(left−right, 0) copies. One shuffle per side.
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics subtraction (non-finished order slots per customer)."""
    orders = table(spark, sf_dir, "orders")
    all_side = orders.select("o_custkey")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return all_side.exceptAll(f_side)


@register(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    survey="B19 (INTERSECT ALL — bag semantics, completes the set-op family)",
    scale="""
    INTERSECT ALL preserves multiplicity: per-key counts on both sides,
    emit min(left, right) copies per key. Like exceptAll this compiles to
    counted generation after one shuffle per side — the shuffle carries
    (key, count) after partial aggregation, never the raw bags, so a
    100 TB bag intersect moves only distinct-key-sized data.
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersection (matched order slots per customer)."""
    orders = table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersectAll(o_side)
