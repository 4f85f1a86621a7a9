"""Map-side operators: projection, explode, partitioning, UDFs, fusion.

Capability parity: the reference's generator ``map`` (A5,
``mrs/tasks.py::MapTask``), partition functions (A7), reduce+map fusion
(A11 ``mrs/tasks.py::ReduceMapTask``), and the everything-is-a-UDF surface
(A18 ``mrs/registry.py``) — SURVEY.md §2.A. In Spark a 1:1 map is a
projection, a 1:n map is explode/posexplode, and fusion is free: narrow ops
after a shuffle share the stage under whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..catalog import table
from ..exprs import pround, pround0
from ..registry import register


@register(
    "map_project",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS net_price,
           upper(l_returnflag) AS rf
    FROM lineitem
    """,
    survey="A5/B2",
    scale="""
    1:1 map = pure projection: no shuffle, fully pipelined inside
    WholeStageCodegen, column-pruned at the scan. Identical plan at any
    scale factor.
    """,
)
def map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator map emitting one transformed pair per input pair."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "net_price"
        ),
        F.upper("l_returnflag").alias("rf"),
    )


@register(
    "map_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 100
    """,
    survey="A5",
    scale="""
    1:n map = explode of a split — narrow, no shuffle. At 100 TB the fanout
    multiplies rows ~50x; keep it upstream of aggregation so map-side
    partial agg shrinks it again before any exchange.
    """,
)
def map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator map emitting 0..n output pairs per input pair."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )


@register(
    "repartition_mod",
    oracle="""
    SELECT CAST(l_orderkey % 16 AS BIGINT) AS part_id,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY 1
    """,
    survey="A7",
    scale="""
    mod_partition parity: pmod(key, n) is computed JVM-side and the
    explicit repartition(16, pmod) IS the declared operator — the
    reference's mod partitioner feeding n reduce splits. The groupBy's
    clustering requirement is satisfied by that exchange, so the plan
    has exactly ONE shuffle (verified: 1 Exchange either way) — but it
    carries UNAGGREGATED rows, since the complete aggregate runs after
    the exchange instead of partial-before/final-after (r11 review).
    That is the honest cost of declaring the partitioner explicitly;
    a production aggregation drops the repartition and lets the agg's
    own exchange ship 16 partial rows per task. At scale prefer hash
    partitioning unless key locality is required; mod on a skewed key
    distribution is how you get stragglers.
    """,
)
def repartition_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mod-partitioning (mrs mod_partition): per-split stats."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.repartition(16, F.pmod("l_orderkey", F.lit(16)))
        .groupBy(F.pmod("l_orderkey", F.lit(16)).cast("long").alias("part_id"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "reducemap_chain",
    oracle="""
    SELECT o_custkey,
           round(sum(o_totalprice), 2) AS total,
           CAST(floor(sum(o_totalprice) / 100000) AS BIGINT) AS band
    FROM orders GROUP BY o_custkey
    """,
    survey="A11",
    scale="""
    reducemap fusion parity: the post-aggregation map (band computation)
    is narrow, so Catalyst pipelines it into the same stage as the final
    aggregation — zero extra shuffle or materialization, exactly the
    optimization ReduceMapTask exists for in the reference.
    """,
)
def reducemap_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduce → map in one stage (mrs Job.reducemap_data)."""
    orders = table(spark, sf_dir, "orders")
    reduced = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("_total")
    )
    # the fused "map": runs in the same stage as the final aggregation
    return reduced.select(
        "o_custkey",
        pround("_total", 2).alias("total"),
        F.floor(F.col("_total") / 100000).cast("long").alias("band"),
    )


@register(
    "python_udf",
    oracle="""
    SELECT c_custkey, reverse(c_name) AS rev_name,
           length(c_name) AS name_len
    FROM customer
    """,
    survey="A18",
    scale="""
    Row-at-a-time Python UDF — deliberately the slow path (one
    Python-worker round trip per batch of rows). Kept for parity with the
    reference's arbitrary-callable surface; every hot-path equivalent in
    this engine uses built-in JVM functions or Arrow-batched pandas UDFs.
    """,
)
def python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary Python callable as map logic (the Mrs UDF model)."""
    rev = F.udf(lambda s: s[::-1] if s is not None else None, StringType())
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        rev("c_name").alias("rev_name"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
               AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    survey="A18/A10",
    scale="""
    Arrow-batched grouped-agg pandas UDF (a UDAF): vectorized transfer,
    10-100x over row-at-a-time. Still a full shuffle of the group's rows to
    Python — for algebraic aggregates prefer built-ins (see groupby_agg);
    this path is for genuinely non-algebraic reducers.
    """,
)
def pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom reducer as a vectorized pandas UDAF (quantity-weighted mean)."""

    @F.pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        pround(wavg("l_extendedprice", "l_quantity"), 2).alias("wavg_price")
    )


@register(
    "python_udtf",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 20
    """,
    survey="A18 (Spark 4 Python UDTF — table-valued UDF)",
    scale="""
    A UDTF is the typed, planner-visible form of the reference's
    generator map (0..n rows out per row in). Still a Python-worker path:
    reserve it for logic explode()/transform() cannot express; this
    tokenizer exists to pin the API, the production twin is map_explode.
    """,
)
def python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator map as a Spark 4 table-valued Python UDF."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            # split(" "), not split(): the oracle's string_split(text,
            # ' ') keeps empty tokens from doubled/leading spaces that
            # any-whitespace split() silently drops, and NULL text must
            # yield no rows instead of an executor-side AttributeError
            # (r11 maps review; fixture docs are single-spaced today)
            if text is None:
                return
            for token in text.split(" "):
                yield (doc_id, token)

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    spark.udtf.register("mrs_tokenize", Tokenize)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.token "
        "FROM _udtf_docs d, LATERAL mrs_tokenize(d.doc_id, d.text) t"
    )


@register(
    "pandas_grouped_map",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round((l_quantity - avg(l_quantity) OVER w)
                 / stddev_samp(l_quantity) OVER w, 4) + 0.0 AS z
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
    survey="A18/A10 (applyInPandas grouped-map transform)",
    scale="""
    Grouped-map: the whole group crosses to Python as Arrow batches and a
    same-schema'd frame returns — the UDTF-like reduce of the reference
    with vectorized transfer. Requires the full group in one worker's
    memory: at 100 TB bound group sizes or switch to the window-function
    twin (the oracle here IS that twin — built-ins beat Python when the
    logic is expressible).
    """,
)
def pandas_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization via applyInPandas."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        qty = pdf["l_quantity"]
        z = (qty - qty.mean()) / qty.std(ddof=1)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "z_raw": z,
            }
        )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    out = li.groupBy("l_returnflag").applyInPandas(
        zscore,
        schema="l_orderkey bigint, l_linenumber int, "
        "l_returnflag string, z_raw double",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        # pround0: z is sign-symmetric around 0 (the r8
        # feature_standardize class) -- a quantity just under its group
        # mean would round to -0.0 under a sign-preserving round
        pround0("z_raw", 4).alias("z"),
    )


@register(
    "python_udtf_table_arg",
    oracle="""
    WITH src AS (SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS p
                 FROM orders WHERE o_orderkey < 2000)
    SELECT o_orderkey, o_custkey, p,
           CASE WHEN p >= 200000 THEN 'high'
                WHEN p >= 50000 THEN 'mid'
                ELSE 'low' END AS tier
    FROM src
    """,
    survey="A18 (Spark 4 polymorphic UDTF with TABLE(...) argument)",
    scale="""
    The TABLE-argument UDTF: the relation itself is the argument
    (SELECT * FROM f(TABLE(v))), so user table-functions compose in SQL
    exactly like built-ins — the Spark 4 capability the reference's
    registry-by-name UDF model maps onto for whole-dataset transforms.
    Rows stream through the Python worker in Arrow batches,
    partition-parallel, no re-partitioning required for a row-wise
    UDTF like this tier tagger. Still the slow path (same rule as
    python_udtf): production twin is the pure-codegen CASE the oracle
    spells.
    """,
)
def python_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise tier tagging via a UDTF taking a TABLE(...) argument."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="o_orderkey bigint, o_custkey bigint, p double,"
          " tier string")
    class TierTag:
        def eval(self, row):
            # p arrives pre-rounded JVM-side (pround): Python's round()
            # is banker's rounding and would diverge from the oracle
            p = row["p"]
            tier = "high" if p >= 200000 else ("mid" if p >= 50000 else "low")
            yield (row["o_orderkey"], row["o_custkey"], p, tier)

    spark.udtf.register("mrs_tier_tag", TierTag)
    (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey", "o_custkey", pround("o_totalprice", 2).alias("p")
        )
        .createOrReplaceTempView("_udtf_orders")
    )
    return spark.sql(
        "SELECT * FROM mrs_tier_tag(TABLE(_udtf_orders))"
    )


@register(
    "python_udf_arrow",
    oracle="""
    SELECT c_custkey, reverse(c_name) AS rev_name,
           length(c_name) AS name_len
    FROM customer
    """,
    survey="A18 (Spark 4 Arrow-optimized scalar Python UDF)",
    scale="""
    The same arbitrary-callable contract as python_udf but executed with
    useArrow=True: rows cross to the Python worker as Arrow record
    batches instead of pickled rows — typically 2-10x on wide scans,
    with identical per-row semantics (this query's oracle IS
    python_udf's). The residual cost is still a worker round trip per
    batch, so the JVM built-in remains the production twin; declare
    useArrow on every row-wise UDF that must stay Python.
    """,
)
def python_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar Python UDF (Spark 4 useArrow=True)."""
    rev = F.udf(
        lambda s: s[::-1] if s is not None else None,
        StringType(),
        useArrow=True,
    )
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        rev("c_name").alias("rev_name"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "arrow_grouped_map",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal,
           round(max(c_acctbal) - min(c_acctbal), 2) AS bal_range
    FROM customer GROUP BY c_mktsegment
    """,
    survey="A18 (Spark 4 applyInArrow — the Arrow-native grouped map: no "
    "pandas materialization between the JVM and user code)",
    scale="""
    Same execution contract as applyInPandas (full group to one worker,
    Arrow transfer) but the user function sees a pyarrow.Table directly —
    skipping the Arrow->pandas conversion removes the per-batch copy and
    pandas' object-dtype traps for string columns. The per-group Python
    work here is pyarrow.compute (C++ kernels), so only control flow is
    interpreted. Still bound group sizes at 100 TB; the oracle is the
    built-in-aggregate twin that wins whenever the logic is expressible.
    """,
)
def arrow_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment stats through applyInArrow (pyarrow.compute kernels)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def seg_stats(tbl: pa.Table) -> pa.Table:
        bal = tbl["c_acctbal"]
        total = pc.sum(bal).as_py()
        lo, hi = pc.min(bal).as_py(), pc.max(bal).as_py()
        # rounding happens Spark-side with pround: Python's round() is
        # half-EVEN, the engine discipline is DuckDB's half-away form
        return pa.table(
            {
                "c_mktsegment": [tbl["c_mktsegment"][0].as_py()],
                "n_cust": pa.array([tbl.num_rows], pa.int64()),
                "total_bal": pa.array([total], pa.float64()),
                "bal_range": pa.array([hi - lo], pa.float64()),
            }
        )

    cust = table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal"
    )
    raw = cust.groupBy("c_mktsegment").applyInArrow(
        seg_stats,
        schema="c_mktsegment string, n_cust bigint, total_bal double, "
        "bal_range double",
    )
    return raw.select(
        "c_mktsegment",
        "n_cust",
        pround("total_bal", 2).alias("total_bal"),
        pround("bal_range", 2).alias("bal_range"),
    )
