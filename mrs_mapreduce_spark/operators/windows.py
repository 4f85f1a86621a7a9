"""Window functions (ranking, analytic, frames).

Capability parity: SURVEY.md §2.B B13–B15. In Mrs a user gets per-key
*sorted-by-key* reduce input; value-ordering and accumulators are hand
code inside the reduce. Spark's window operator is the native form: one
shuffle on the partition key, one in-partition sort, then all ranking,
offset and frame aggregates stream over the sorted run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..exprs import pround, pround0
from ..registry import register

#: Deterministic in-partition order: ts_ns is exact int64 nanos and
#: event_id breaks any residual tie.
_EVENT_ORDER = ("ts_ns", "event_id")


@register(
    "window_rank",
    oracle="""
    SELECT user_id, event_id, rn, rk, drk, nt
    FROM (
      SELECT user_id, event_id,
             row_number() OVER w_unique AS rn,
             rank()       OVER w_type   AS rk,
             dense_rank() OVER w_type   AS drk,
             ntile(4)     OVER w_unique AS nt
      FROM events
      WINDOW w_unique AS (PARTITION BY user_id
                          ORDER BY epoch_ns(ts), event_id),
             w_type   AS (PARTITION BY user_id ORDER BY event_type)
    ) WHERE rn <= 5
    """,
    survey="B13",
    scale="""
    All four ranking functions share one shuffle+sort per WINDOW clause.
    rank/dense_rank over a tied key are deterministic; row_number/ntile
    need a total order (ts_ns, event_id) to be replayable — at 100 TB a
    nondeterministic row_number is a silent correctness bug on retry.
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number / rank / dense_rank / ntile per user."""
    ev = table(spark, sf_dir, "events")
    w_unique = Window.partitionBy("user_id").orderBy(*_EVENT_ORDER)
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w_unique).alias("rn"),
            F.rank().over(w_type).alias("rk"),
            F.dense_rank().over(w_type).alias("drk"),
            F.ntile(4).over(w_unique).alias("nt"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_val,
           lead(value) OVER w AS next_val,
           first_value(value) OVER w AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
    """,
    survey="B14",
    scale="""
    Offset functions are O(1) per row over the sorted run — same single
    shuffle as ranking. No rounding needed: values pass through untouched,
    so both engines emit bit-identical doubles.
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic offsets: lag / lead / first_value per user timeline."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_EVENT_ORDER)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_val"),
        F.lead("value").over(w).alias("next_val"),
        F.first("value").over(w).alias("first_val"),
    )


@register(
    "window_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts), event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW), 2) AS cum_val,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts), event_id
                                  ROWS BETWEEN 2 PRECEDING
                                           AND CURRENT ROW), 2) AS mov_avg
    FROM events
    """,
    survey="B15",
    scale="""
    Running and sliding frames stream over the sorted partition with O(1)
    state — the hand-written accumulator a Mrs reduce would carry. The
    frame order is a total order, so the float accumulation sequence is
    identical across engines and retries.
    """,
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregates: cumulative sum + 3-row moving average."""
    ev = table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy(*_EVENT_ORDER)
    w_cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = base.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        pround(F.sum("value").over(w_cum), 2).alias("cum_val"),
        pround(F.avg("value").over(w_mov), 2).alias("mov_avg"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) AS price,
           count(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING
                                   AND 10000 FOLLOWING) AS n_near,
           round(sum(o_totalprice) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING
                                   AND 10000 FOLLOWING), 2) AS sum_near
    FROM orders WHERE o_orderkey < 2000
    """,
    survey="B15 (RANGE frames: value-distance windows)",
    scale="""
    RANGE frames bound by VALUE distance, not row offsets — a moving
    neighborhood aggregate (density estimation, banded smoothing). The
    frame is computed over the sorted run with two moving pointers, O(n)
    per partition. Unpartitioned here (bounded by the key filter); at
    scale always partition first — a global RANGE window is single-task.
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range frame: stats over +/-10000 price neighborhoods."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.orderBy("o_totalprice").rangeBetween(-10000, 10000)
    return orders.select(
        "o_orderkey",
        pround("o_totalprice", 2).alias("price"),
        F.count(F.lit(1)).over(w).alias("n_near"),
        pround(F.sum("o_totalprice").over(w), 2).alias("sum_near"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           round(percent_rank() OVER w, 6) AS pct_rk,
           round(cume_dist() OVER w, 6) AS cd,
           round(nth_value(c_acctbal, 2) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING), 2) AS second_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    survey="B13 (distribution family: percent_rank / cume_dist / nth_value)",
    scale="""
    percent_rank and cume_dist are rank arithmetic — streamed over the
    same sorted run as B13, no extra pass. nth_value with an UNBOUNDED
    FOLLOWING frame forces full-partition buffering: fine partitioned by
    nation (bounded groups), a spill hazard on skewed keys — same
    discipline as agg_percentile. Order key (c_acctbal, c_custkey) is a
    total order, so every value is replay-deterministic.
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family over customer balances per nation."""
    cust = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        pround(F.percent_rank().over(w), 6).alias("pct_rk"),
        pround(F.cume_dist().over(w), 6).alias("cd"),
        pround(F.nth_value("c_acctbal", 2).over(w_full), 2).alias("second_bal"),
    )


@register(
    "window_moving_stats",
    oracle="""
    SELECT event_id,
           user_id,
           round(avg(value) OVER w, 4) AS mov_avg,
           round(min(value) OVER w, 2) AS mov_min,
           round(max(value) OVER w, 2) AS mov_max
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY epoch_ns(ts), event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    survey="B15 (bounded sliding frame: moving average/min/max)",
    scale="""
    The bounded-frame counterpart of window_frame's cumulative sum:
    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW keeps O(frame) state per
    row during the single per-user sort pass — avg/min/max all share
    the one WindowExec, so adding aggregates to the same frame is free.
    The (ts_ns, event_id) composite order makes every frame's membership
    deterministic. At 100 TB the cost model is unchanged from any
    window: one hash exchange on user_id + one within-partition sort;
    frame width affects only per-row state, never shuffle volume.
    """,
)
def window_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving avg/min/max of value per user, deterministic order."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(*_EVENT_ORDER)
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        pround(F.avg("value").over(w), 4).alias("mov_avg"),
        pround(F.min("value").over(w), 2).alias("mov_min"),
        pround(F.max("value").over(w), 2).alias("mov_max"),
    )


@register(
    "window_regression",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, epoch_ns(ts) AS tsn,
             CAST(value AS DOUBLE) AS v,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY epoch_ns(ts), event_id)
                  AS DOUBLE) AS x
      FROM events WHERE event_type = 'purchase')
    SELECT user_id, event_id,
           round(regr_slope(v, x) OVER (
               PARTITION BY user_id ORDER BY x
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) + 0.0
               AS slope10
    FROM seq
    """,
    survey="B15 extension (rolling OLS slope — windowed regr_* family)",
    scale="""
    Trend detection as a window aggregate: regr_slope over a trailing
    10-row frame per user — the regression state (sums of x, y, xy, x²)
    is algebraic, so the frame slides in O(1) per row and the whole
    relation costs the one user_id exchange every per-entity window
    shares. The x regressor is the per-user sequence number, NOT the
    raw epoch (micro-second x values would put both engines' variance
    sums into catastrophic-cancellation territory and their last-ulp
    noise would diverge); small dense x keeps the closed form stable
    enough that 4-decimal rounding hash-matches.
    """,
)
def window_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 10-purchase OLS slope of value per user."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w_seq = Window.partitionBy("user_id").orderBy(*_EVENT_ORDER)
    seq = ev.select(
        "user_id",
        "event_id",
        F.col("value").cast("double").alias("v"),
        F.row_number().over(w_seq).cast("double").alias("x"),
    )
    w_frame = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-9, Window.currentRow)
    )
    return seq.select(
        "user_id",
        "event_id",
        # pround0: a trailing-window slope is sign-symmetric around 0,
        # so a slope in (-5e-5, 0) would round to -0.0 under a
        # sign-preserving round -- the negzero-gate class (r11 review)
        pround0(F.regr_slope("v", "x").over(w_frame), 4).alias("slope10"),
    )


@register(
    "window_count_distinct",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(DISTINCT o_orderpriority)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS run_distinct
    FROM orders WHERE o_custkey < 200
    """,
    survey="B13/B15 extension (COUNT(DISTINCT) OVER — an aggregate Spark's "
    "window operator does not support natively, expressed as "
    "size(collect_set) over the same frame)",
    scale="""
    Spark rejects DISTINCT aggregates in windows; size(collect_set(...))
    over the identical ROWS frame is the standard rewrite and plans as
    ONE WindowExec after one hash exchange on o_custkey — same shape as
    any frame aggregate. The state per partition row is the set of
    distinct values seen, bounded by the attribute's cardinality (5
    priorities here); for high-cardinality columns the rewrite to a
    dense_rank-over-first-occurrence running max avoids the set
    entirely. Frames are pinned ROWS (not RANGE) on both engines so tied
    order keys cannot diverge.
    """,
)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct order-priority count per customer."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("long")
        .alias("run_distinct"),
    )


@register(
    "window_count_distinct_scalable",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(DISTINCT o_orderpriority)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS run_distinct
    FROM orders WHERE o_custkey < 200
    """,
    survey="B13/B15 extension (running COUNT DISTINCT with O(1) window "
    "state — the high-cardinality rewrite window_count_distinct's "
    "scale note prescribes)",
    scale="""
    Same semantics as window_count_distinct, different state bound: a
    row is a FIRST OCCURRENCE of its value within the partition iff
    row_number over (partition, value) ordered by the running order is
    1; the running distinct count is then a plain running SUM of that
    0/1 flag. Window state drops from the set-of-values (cardinality-
    bounded) to one counter — safe when the windowed attribute has
    millions of distinct values per partition. Cost: two WindowExecs
    over two sorts of the same exchange (value-order then row-order)
    instead of one; pick per attribute cardinality. Both engines pin
    ROWS frames and the value definition, so results are hash-equal to
    the DISTINCT form.
    """,
)
def window_count_distinct_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Running distinct count via first-occurrence flags + running sum."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w_first = Window.partitionBy("o_custkey", "o_orderpriority").orderBy(
        "o_orderkey"
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = orders.withColumn(
        "_first",
        F.when(F.row_number().over(w_first) == 1, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    return flagged.select(
        "o_orderkey",
        "o_custkey",
        F.sum("_first").over(w_run).cast("long").alias("run_distinct"),
    )
