"""Classic TPC-H query shapes beyond the flagship Q1/Q3/Q5.

Fixture schemas omit a few TPC-H columns (commitdate/receiptdate,
shipmode); Q4 and Q12 are adapted to equivalent plan shapes on available
columns — the point is the SHAPE (exists-agg, range-filter-agg,
conditional share, having-join), not the exact TPC-H text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS cnt
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    survey="B1/B9 (TPC-H Q6: forecast revenue change)",
    scale="""
    Pure scan-filter-aggregate: every predicate pushes to parquet
    (row-group skipping on shipdate), single partial->final agg, no
    wide rows survive the scan. The canonical 'I/O-bound at any scale'
    query — plan quality == pushdown completeness.
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: revenue from discounted small-quantity lineitems in 1998."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > 45)
    GROUP BY o.o_orderpriority
    """,
    survey="B6/B9 (TPC-H Q4 shape: exists-semijoin + aggregate)",
    scale="""
    Semi join feeds the aggregate: the lineitem side reduces to distinct
    qualifying orderkeys before the join — never a row multiplication.
    (Adapted: fixtures lack commitdate/receiptdate, the exists predicate
    uses quantity.)
    """,
)
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders having at least one qualifying lineitem."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            li, orders.o_orderkey == li.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q14",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END), 2) AS promo_part,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS total
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-07-01'
    """,
    survey="B4/B9 (TPC-H Q14: promotion revenue share)",
    scale="""
    Fact-to-dimension join with the dimension broadcast; the conditional
    share is one pass (no second scan for the numerator). Output split
    into two sums instead of the division so the oracle avoids a
    denominator rounding interaction.
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: revenue share of promo parts."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            pround(
                100.0
                * F.sum(
                    F.when(F.col("p_type").like("PROMO%"), net).otherwise(0.0)
                ),
                2,
            ).alias("promo_part"),
            pround(F.sum(net), 2).alias("total"),
        )
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_odate,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
    """,
    survey="B3/B6/B9 (TPC-H Q18: large-volume customers, having+in)",
    scale="""
    The HAVING subquery reduces lineitem to qualifying orderkeys FIRST
    (partial-aggregated groupBy), then semijoins the spine — the filter
    hits before the expensive 3-way join, not after. IN-subquery ==
    left_semi on the aggregated keys.
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 150, with customer."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(
            big, orders.o_orderkey == big.l_orderkey, "left_semi"
        )
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(pround(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_odate"),
            "total_qty",
        )
    )
