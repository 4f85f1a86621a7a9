"""All 22 TPC-H query shapes (Q1 lives in aggregates, Q5 in sql_api).

Fixture schemas omit a few TPC-H columns (commitdate/receiptdate,
shipmode) and the partsupp table; affected queries are adapted to
equivalent plan shapes on available columns — Q2/Q11/Q20 run on a
partsupp proxy derived from lineitem — because the point is the SHAPE
(exists-agg, correlated min/avg, scalar subqueries, disjunctive
predicates, outer-join histograms), not the exact TPC-H text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import cents, net4, net4_sql, pround, rev4, rev4_sql
from ..registry import register


#: the money-sum discipline now lives in ..exprs (promoted r11 so the
#: non-tpch money sums share ONE definition); these aliases keep the
#: q3-era local names
_cents = cents
_net4 = net4
_rev4 = rev4
_net4_sql = net4_sql
_rev4_sql = rev4_sql


@register(
    "tpch_q6",
    oracle="""
    SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0, 2)
               AS revenue,
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
                F.sum(
                    _cents(F.col("l_extendedprice"))
                    * _cents(F.col("l_discount"))
                )
                / 10000.0,
                2,
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
    oracle=f"""
    SELECT round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN {_net4_sql('l.')}
                         ELSE 0 END) / 100.0, 2) AS promo_part,
           round({_rev4_sql('l.')} / 10000.0, 2) AS total
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
    net4 = _net4()
    return (
        # no hard hint: part scales with the corpus, and a broadcast HINT
        # is honored at any size (AQE demotes only estimate-based picks).
        # At fixture SF the planner broadcasts it from parquet stats
        # anyway; at 100 TB this degrades gracefully to a shuffle join.
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            pround(
                F.sum(
                    F.when(F.col("p_type").like("PROMO%"), net4).otherwise(
                        F.lit(0).cast("long")
                    )
                )
                / 100.0,
                2,
            ).alias("promo_part"),
            pround(_rev4() / 10000.0, 2).alias("total"),
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
    One lineitem scan, one shuffle: the HAVING aggregate (partial
    groupBy on orderkey) both filters AND supplies total_qty, because
    orderkey functionally determines the (customer, orderdate) group —
    no second pass over the fact table. The qualifying-order set is tiny
    at any scale (quantity > 150 is a tail), so it broadcasts through
    orders; customer broadcasts at test SF and at 100 TB flips to a
    shuffle join on custkey, which AQE picks when the dim outgrows the
    broadcast threshold.
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 150, with customer."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    # orderkey determines (customer, orderdate), so the final per-group
    # quantity sum IS the per-orderkey aggregate the HAVING already
    # computed — one lineitem scan + one shuffle, then the tiny
    # qualifying-order set broadcasts through orders and customer
    # instead of rejoining the fact table.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        # no hard hints: `big` and customer both scale with the corpus
        # (a hint is honored at ANY size). AQE broadcasts the qualifying
        # set from its measured runtime size — which is exactly the
        # "flips to shuffle when it outgrows the threshold" contract the
        # scale note declares.
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_odate"),
            pround(F.col("q"), 2).alias("total_qty"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                      AS BIGINT) / 10000.0, 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_odate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
    survey="B3/B4/B9 (TPC-H Q3: shipping-priority revenue)",
    scale="""
    Customer (filtered to one segment, ~1/5) broadcasts into orders; the
    orders->lineitem join shuffles on orderkey only AFTER both date
    filters have pruned the fact scans. Group keys include the join key,
    so AQE can keep the aggregation partial-heavy. No LIMIT declared:
    top-k ties are nondeterministic under hashing. Revenue is summed in
    exact integer cents (price and discount both have 2-decimal domains)
    because per-order groups are tiny: a 4-double sum differs across
    engines in the last ulp and 4/1290 groups landed exactly on a .005
    rounding boundary — integer sums are order-independent, so the
    declared value is deterministic at any scale.
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: revenue of building-segment orders not yet shipped by a date."""
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp_ntz")
    )
    return (
        # customer scales: no hard hint, AQE picks broadcast while the
        # filtered segment fits and SMJ beyond (tpch_q14 discipline)
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(pround(_rev4() / 10000.0, 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_odate"),
        )
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           round({_rev4_sql('l.')} / 10000.0, 2) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    survey="B3/B4/B9 (TPC-H Q7: volume shipping between nation pair)",
    scale="""
    Five-way join where every dimension (supplier, customer via orders,
    both nation aliases) broadcasts; only the orders<->lineitem edge
    shuffles. The nation-pair disjunction is applied on the broadcast
    sides BEFORE the fact join, so ~23/25 of suppliers/customers never
    reach the shuffle. Self-aliased dimension (nation twice) exercises
    plan-level dedup of the same scan.
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: revenue shipped between NATION_1 and NATION_2, per year."""
    pair = ("NATION_1", "NATION_2")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "cust_nation")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem")
    return (
        # supplier/customer scale with the corpus: no hard hints (the
        # 2-nation pre-filter keeps them broadcast-SIZED at fixture SF,
        # which AQE sees at runtime; a hint would pin the choice forever)
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(pround(_rev4() / 10000.0, 2).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_7'
                          THEN {_net4_sql('l.')}
                          ELSE 0 END) / 10000.0, 2) AS nation_volume,
           round({_rev4_sql('l.')} / 10000.0, 2) AS total_volume
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    GROUP BY year(o.o_orderdate)
    """,
    survey="B3/B4/B9 (TPC-H Q8: national market share)",
    scale="""
    The deepest fixture join (7 tables). Part filter (1/6 of parts) and
    the region->nation semi-chain prune before any shuffle; numerator and
    denominator emitted separately (q14 discipline) so the oracle never
    divides two order-dependent sums. Snowflake arm region->nation->
    customer collapses into one broadcast chain.
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_7 suppliers' share of PROMO revenue sold into EUROPE."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nat = table(spark, sf_dir, "nation")
    eu_nations = nat.join(
        F.broadcast(region), nat.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cust_nk"))
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(eu_nations), F.col("c_nationkey") == F.col("cust_nk"))
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem")
    vol4 = _net4()
    return (
        # part/supplier/customer all scale: no hard hints (nation/region
        # arms above stay hinted — those are constant-size)
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            pround(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_7", vol4
                    ).otherwise(F.lit(0).cast("long"))
                )
                / 10000.0,
                2,
            ).alias("nation_volume"),
            pround(_rev4() / 10000.0, 2).alias("total_volume"),
        )
    )


@register(
    "tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           round({_rev4_sql('l.')} / 10000.0, 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    survey="B3/B4/B9 (TPC-H Q9 shape: product-line profit by nation/year)",
    scale="""
    Adapted: fixtures have no partsupp, so profit omits supplycost — the
    plan shape (substring part filter + 5-way join + two-level group) is
    what's exercised. The LIKE filter can't push to parquet as a range
    but still prunes the broadcast build side before the fact shuffle.
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on %red% parts by supplier nation and year."""
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").select(
                    "n_nationkey", F.col("n_name").alias("nation")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    return (
        # part/supplier scale: no hard hints (q8 discipline)
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(pround(_rev4() / 10000.0, 2).alias("profit"))
    )


@register(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation,
           round({_rev4_sql('l.')} / 10000.0, 2) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    """,
    survey="B3/B9 (TPC-H Q10: returned-item revenue per customer)",
    scale="""
    Orders prune to one quarter BEFORE joining lineitem (date filter is
    on the probe side of the orderkey shuffle); returnflag filter prunes
    lineitem at scan. Customer is wide in real TPC-H — grouping on the
    key then joining customer attributes after the agg keeps the shuffle
    rows narrow; here customer is small enough to broadcast pre-agg.
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: Q1-1998 revenue lost to returns, per customer."""
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(pround(_rev4() / 10000.0, 2).alias("revenue"))
        # customer scales: no hard hint; nation is constant-size and keeps
        # its broadcast
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            pround(F.col("c_acctbal"), 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
            "revenue",
        )
    )


@register(
    "tpch_q12_shape",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l.l_linestatus
    """,
    survey="B3/B9 (TPC-H Q12 shape: priority class counts per line status)",
    scale="""
    Adapted: fixtures lack l_shipmode/commitdate, so the group key is
    l_linestatus and the window is shipdate. The shape is the point:
    fact-side filter -> join -> conditional-count pivot in ONE pass
    (no per-priority re-scan). Integer conditional sums are order-exact,
    so no rounding discipline needed.
    """,
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: high/low-priority lineitem counts shipped in 1998."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    survey="B5/B9 (TPC-H Q13: customer order-count distribution)",
    scale="""
    Left-outer with a join-side (not WHERE) predicate — customers with
    zero qualifying orders must survive with c_count=0. Double
    aggregation: the first groups on the join key (so it rides the join
    shuffle), the second is a tiny histogram that AQE coalesces to a
    handful of partitions. count(col) null-skipping semantics match
    DuckDB exactly.
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: distribution of non-urgent order counts per customer."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_rev4_sql()} AS rev4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1998-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(r.rev4 / 10000.0, 2) AS total_rev
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.rev4 = (SELECT max(rev4) FROM revenue)
    """,
    survey="B9/B17 + scalar subquery (TPC-H Q15: top supplier)",
    scale="""
    The scalar-subquery-over-aggregate shape: revenue CTE computed once,
    its max broadcast back as a one-row join. Spark reuses the
    aggregated (tiny, one row per supplier) frame for both sides, so
    lineitem is scanned once. Equality is on the ROUNDED revenue on both
    sides — comparing raw doubles across engines would be flaky.
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum Q1-1998 revenue."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp_ntz"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_rev4().alias("rev4"))
    )
    max_rev = revenue.agg(F.max("rev4").alias("m"))
    supp = table(spark, sf_dir, "supplier")
    return (
        # max_rev is ONE row (keeps its hint); supplier scales (loses it)
        # the max-equality join compares EXACT int64 revenue, so the
        # winning supplier set is deterministic on both engines; round
        # only for display (r11 tpch review finding #1)
        revenue.join(F.broadcast(max_rev), F.col("rev4") == F.col("m"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            pround(F.col("rev4") / 10000.0, 2).alias("total_rev"),
        )
    )


@register(
    "tpch_q16_shape",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 14, 20, 28, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    survey="B3/B10 (TPC-H Q16 shape: supplier variety per part profile)",
    scale="""
    Adapted: no partsupp fixture, so supplier variety is observed through
    lineitem. count(DISTINCT) over a join: Spark expands to a two-phase
    distinct-then-count aggregate, partial on the shuffle key — at 100 TB
    the distinct set per (brand,type,size) stays bounded by supplier
    cardinality, so no skew blowup.
    """,
)
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers serving each (brand, type, size)."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 28, 36, 45)
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        # part scales: no hard hint, AQE decides from the filtered size
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
    survey="B3/B9 + correlated subquery (TPC-H Q17: small-quantity revenue)",
    scale="""
    Correlated scalar subquery decorrelated by hand: per-part avg is a
    groupBy over ONLY the lineitems of qualifying (one brand, ~1/25)
    parts, broadcast back. l_quantity is integer-valued, so avg is
    order-exact and the 0.2*avg threshold is deterministic across
    engines — this is why q17 can be value-checked at all. DuckDB runs
    the genuinely correlated form, making it an independent witness of
    our decorrelation.
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from below-fifth-of-average-quantity lineitems."""
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = table(spark, sf_dir, "lineitem")
    # part and the per-part threshold frame both scale: no hard hints
    # (the brand filter keeps them broadcast-sized at fixture SF, which
    # AQE measures at runtime)
    li_b = li.join(
        part.select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    thresholds = (
        li_b.groupBy("l_partkey")
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li_b.join(thresholds, on="l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(pround(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT round({_rev4_sql('l.')} / 10000.0, 2) AS revenue,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    survey="B1/B3 (TPC-H Q19: disjunctive mixed-table predicate)",
    scale="""
    The OR spans both tables, so it can't fully push to either scan —
    but each disjunct's single-table conjuncts CAN: Catalyst extracts
    brand IN (...) AND size<=15 to the part scan and quantity<=30 to the
    lineitem scan as a weaker pushed prefilter, then applies the exact
    predicate post-join. Declared as agg (not row list) to keep the
    oracle payload small at any SF.
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: revenue matching brand/size/quantity disjunction."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    # part scales: no hard hint (q14 discipline)
    j = li.join(part, li.l_partkey == part.p_partkey)
    d1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(d1 | d2 | d3).agg(
        pround(_rev4() / 10000.0, 2).alias("revenue"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "tpch_q21_shape",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    survey="B6 + exists/not-exists (TPC-H Q21 shape: sole-blame supplier)",
    scale="""
    Adapted: no receipt/commit dates, so "late" is l_returnflag='R'. The
    EXISTS pair is decorrelated into ONE per-order aggregate (distinct
    suppliers, distinct R-suppliers) instead of two correlated
    self-joins — at 100 TB that's a single extra shuffle of (orderkey,
    2 ints) versus two lineitem x lineitem joins. DuckDB runs the
    correlated original as the independent witness.
    """,
)
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers solely responsible for returns in F orders."""
    li = table(spark, sf_dir, "lineitem")
    order_stats = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            order_stats.filter(
                (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)
            ).select("l_orderkey"),
            on="l_orderkey",
            how="left_semi",
        )
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
    survey="B6 + scalar subquery (TPC-H Q22: dormant rich customers)",
    scale="""
    Anti join (customers with NO orders) + uncorrelated scalar threshold
    broadcast to every partition. The anti join probes orders with only
    o_custkey projected; at scale the build side is the distinct custkey
    set, far smaller than orders itself. Threshold is avg of >0 doubles
    — a customer sitting within one ulp of the mean could flip, accepted
    and verified at sf0.01 and sf0.1.
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders since 2000."""
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            pround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# -- partsupp proxy -------------------------------------------------------
# Fixtures ship no partsupp table; Q2/Q11/Q20 run on a proxy derived from
# lineitem: per (partkey, suppkey), cost = min unit price (exact double
# SELECTION, no summation -> cross-engine deterministic) and qty = total
# quantity shipped (integer-valued, order-exact). The SQL spelling below
# is duplicated in each oracle so DuckDB derives the same proxy.

_PARTSUPP_SQL = """
    partsupp AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               round(sum(l_quantity), 0) AS ps_availqty
        FROM lineitem GROUP BY 1, 2
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "ps_supplycost"
        ),
        F.round(F.sum("l_quantity"), 0).alias("ps_availqty"),
    )


@register(
    "tpch_q2_shape",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT p.p_partkey, s.s_name, n.n_name AS nation,
           round(ps.ps_supplycost, 4) AS cost
    FROM part p
    JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT min(ps2.ps_supplycost)
          FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    """,
    survey="B3/B9 + correlated min (TPC-H Q2 shape: cheapest regional supplier)",
    scale="""
    The correlated-min pattern decorrelated: per-part regional min cost is
    one groupBy over the (already region-pruned) partsupp proxy, joined
    back on (partkey, cost). Cost equality joins on an EXACT double — min
    is a selection, not arithmetic, so both engines pick bit-identical
    values. At 100 TB partsupp-side filters (region) apply before the
    min, so the argmin join never sees out-of-region suppliers.
    """,
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost EUROPE supplier for each size-15 part."""
    ps = _partsupp(spark, sf_dir)
    part = table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(region), nat.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )
    # eu_supp / min_cost / part scale with the corpus: no hard hints
    # (nation/region above keep theirs — constant-size)
    eu_ps = ps.join(eu_supp, ps.ps_suppkey == F.col("s_suppkey"))
    # alias the derived frame: min_cost shares eu_ps's lineage, and an
    # unaliased equality on ps_partkey resolves to a trivially-true
    # self-reference instead of a join condition
    min_cost = (
        eu_ps.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
        .select(F.col("ps_partkey").alias("mc_partkey"), "min_cost")
    )
    return (
        eu_ps.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(part, F.col("ps_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "s_name",
            "nation",
            pround("ps_supplycost", 4).alias("cost"),
        )
    )


@register(
    "tpch_q11_shape",
    oracle=f"""
    WITH {_PARTSUPP_SQL},
    value_by_part AS (
        SELECT n.n_name AS nation, ps.ps_partkey,
               CAST(sum(CAST(round(ps.ps_supplycost * 100) AS BIGINT)
                        * CAST(ps.ps_availqty AS BIGINT)) AS BIGINT) AS cents
        FROM partsupp ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name, ps.ps_partkey
    )
    SELECT nation, ps_partkey, round(cents / 100.0, 2) AS part_value
    FROM value_by_part
    WHERE cents > (SELECT 3 * avg(cents) FROM value_by_part)
    """,
    survey="B9 + scalar subquery (TPC-H Q11 shape: significant stock value)",
    scale="""
    HAVING-against-global-statistic: the per-(nation, part) rollup is
    computed once and reused for both the rows and the scalar threshold
    (Spark reuses the exchange; the threshold is a one-row broadcast).
    A 3x-mean cutoff tracks corpus size automatically — no tuning per SF
    (TPC-H's fixed 0.0001/SF fraction selects nothing on uniform fixture
    data).
    """,
)
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: (nation, part) stock values above 0.1% of total."""
    ps = _partsupp(spark, sf_dir)
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    by_part = (
        # supplier scales: no hard hint; nation keeps its broadcast
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "ps_partkey")
        .agg(
            # exact integer cents: unit cost rounded to cents x integer
            # qty — the sum is order-independent, so neither the 3x-mean
            # threshold nor the reported value can straddle a rounding
            # boundary across engines (same discipline as tpch_q3)
            F.sum(
                _cents(F.col("ps_supplycost"))
                * F.col("ps_availqty").cast("long")
            ).alias("cents")
        )
    )
    threshold = by_part.agg((3 * F.avg("cents")).alias("cut"))
    return (
        by_part.join(F.broadcast(threshold), F.col("cents") > F.col("cut"))
        .select(
            "nation",
            "ps_partkey",
            pround(F.col("cents") / 100.0, 2).alias("part_value"),
        )
    )


@register(
    "tpch_q20_shape",
    oracle=f"""
    WITH {_PARTSUPP_SQL}
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        WHERE p.p_name LIKE '%red%'
          AND ps.ps_availqty > (
              SELECT 0.5 * sum(l.l_quantity)
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_shipdate >= TIMESTAMP '1998-01-01'
                AND l.l_shipdate < TIMESTAMP '1999-01-01')
    )
    """,
    survey="B6 + correlated agg subquery (TPC-H Q20 shape: surplus suppliers)",
    scale="""
    Nested IN + correlated aggregate, decorrelated to two pre-aggregated
    frames joined on partkey: the 1998-shipment totals (integer
    quantities, order-exact) and the part-filtered proxy stock. Only
    suppliers clearing the surplus bar reach the final semi join. The
    LIKE filter prunes parts before any per-part aggregate is consumed.
    """,
)
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding >half of 1998 shipments of red parts."""
    ps = _partsupp(spark, sf_dir)
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li98 = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    shipped = li98.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        (0.5 * F.sum("l_quantity")).alias("half_shipped")
    )
    surplus = (
        # part and the per-part shipped totals scale: no hard hints
        ps.join(part, ps.ps_partkey == part.p_partkey, "left_semi")
        .join(shipped, F.col("ps_partkey") == F.col("sp_partkey"))
        .filter(F.col("ps_availqty") > F.col("half_shipped"))
        .select("ps_suppkey")
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        supp.join(surplus, supp.s_suppkey == surplus.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
    )
