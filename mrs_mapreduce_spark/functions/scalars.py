"""String, date/time and math scalar functions (B20–B22).

Capability parity: arbitrary Python string/date/math code inside a Mrs
``map`` (SURVEY.md §2.B). Engine form: built-in ``pyspark.sql.functions``
— JVM-side, codegen'd, pushdown-friendly — never row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lo,
           upper(c_mktsegment) AS up,
           length(c_name) AS len,
           substr(c_name, 1, 8) AS pre,
           reverse(c_name) AS rev,
           concat_ws('-', c_mktsegment, c_name) AS cw,
           replace(c_name, 'e', '_') AS repl,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           levenshtein(c_mktsegment, 'BUILDING') AS lev,
           trim(concat(' ', c_name, ' ')) AS trimmed
    FROM customer
    """,
    survey="B20",
    scale="All codegen'd JVM expressions — narrow, zero shuffle, column-pruned scan.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over customer names."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lo"),
        F.upper("c_mktsegment").alias("up"),
        F.length("c_name").alias("len"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.reverse("c_name").alias("rev"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("cw"),
        F.replace(F.col("c_name"), F.lit("e"), F.lit("_")).alias("repl"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
        F.trim(F.concat(F.lit(" "), "c_name", F.lit(" "))).alias("trimmed"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
           last_day(CAST(o_orderdate AS DATE)) AS meod,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
               AS days_to_2002,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
    survey="B21",
    scale="Pure projection; date_trunc buckets are also valid partition keys at scale.",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over order dates (timestamp_ntz)."""
    o = table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.quarter(od).alias("q"),
        F.date_trunc("month", od).cast("date").alias("mstart"),
        F.last_day(od.cast("date")).alias("meod"),
        F.date_add(od.cast("date"), 30).alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), od.cast("date")).alias(
            "days_to_2002"
        ),
        F.expr("cast(to_unix_timestamp(o_orderdate) as long)").alias("epoch_s"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.1, 2) AS tenth,
           round(abs(l_discount - 0.05), 4) AS absd,
           CAST(ceil(l_quantity) AS BIGINT) AS ce,
           CAST(floor(l_quantity) AS BIGINT) AS fl,
           round(sqrt(l_quantity), 6) AS sq,
           round(ln(l_extendedprice), 6) AS lnp,
           round(log10(l_extendedprice), 6) AS lgp,
           round(pow(l_quantity, 2), 2) AS p2,
           CAST(l_orderkey % 7 AS BIGINT) AS m7,
           CAST(sign(l_tax - 0.04) AS DOUBLE) AS sg
    FROM lineitem
    """,
    survey="B22",
    scale="Codegen'd arithmetic; constant subexpressions fold at plan time.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family over lineitem measures."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * 0.1, 2).alias("tenth"),
        pround(F.abs(F.col("l_discount") - 0.05), 4).alias("absd"),
        F.ceil("l_quantity").alias("ce"),
        F.floor("l_quantity").alias("fl"),
        pround(F.sqrt("l_quantity"), 6).alias("sq"),
        pround(F.log("l_extendedprice"), 6).alias("lnp"),
        pround(F.log10("l_extendedprice"), 6).alias("lgp"),
        pround(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
        F.pmod("l_orderkey", F.lit(7)).cast("long").alias("m7"),
        F.signum(F.col("l_tax") - 0.04).alias("sg"),
    )


@register(
    "fn_cond",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN 'disc' ELSE 'nodisc' END AS d_flag,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS rf_or_none,
           round(least(l_tax, l_discount), 4) AS lo,
           round(greatest(l_tax, l_discount), 4) AS hi
    FROM lineitem
    """,
    survey="B1/B2 (conditional expressions)",
    scale="Pure codegen'd projection; CASE chains fold into branch-free selects.",
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression family: CASE, nullif/coalesce, least/greatest."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.when(F.col("l_discount") > 0.05, "disc")
        .otherwise("nodisc")
        .alias("d_flag"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "rf_or_none"
        ),
        pround(F.least("l_tax", "l_discount"), 4).alias("lo"),
        pround(F.greatest("l_tax", "l_discount"), 4).alias("hi"),
    )


@register(
    "fn_hash",
    oracle='''
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           substr(md5(concat(lang, '|', source)), 1, 12) AS h_block
    FROM documents
    ''',
    survey="B20 (cryptographic hash functions — dedup/fingerprint substrate)",
    scale="Hashing at scan time turns arbitrary-size payloads into fixed-size shuffle keys.",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha256 / truncated composite-key hash."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.substring(
            F.md5(F.concat("lang", F.lit("|"), "source")), 1, 12
        ).alias("h_block"),
    )


@register(
    "fn_null",
    oracle="""
    SELECT l_linestatus,
           count(*) AS cnt,
           count(nullif(l_returnflag, 'N')) AS cnt_not_n,
           round(sum(CASE WHEN l_returnflag = 'N' THEN NULL
                          ELSE l_quantity END), 2) AS qty_not_n,
           round(avg(nullif(l_discount, 0.0)), 6) AS avg_nonzero_disc,
           CAST(max(CASE WHEN FALSE THEN l_quantity END) IS NULL AS BOOLEAN)
               AS all_null_max_is_null
    FROM lineitem GROUP BY l_linestatus
    """,
    survey="B1/B9 (NULL semantics: count/sum/avg ignore NULLs)",
    scale="Null handling is plan-invariant; declared to pin SQL semantics parity.",
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL propagation and aggregate-skipping semantics."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count(F.nullif("l_returnflag", F.lit("N"))).alias("cnt_not_n"),
        pround(
            F.sum(
                F.when(F.col("l_returnflag") == "N", None).otherwise(
                    F.col("l_quantity")
                )
            ),
            2,
        ).alias("qty_not_n"),
        pround(F.avg(F.nullif("l_discount", F.lit(0.0))), 6).alias(
            "avg_nonzero_disc"
        ),
        F.max(F.when(F.lit(False), F.col("l_quantity")))
        .isNull()
        .alias("all_null_max_is_null"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, o_custkey) AS bxor,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt
    FROM orders WHERE o_orderkey < 200
    """,
    survey="B22 (bitwise family: and/or/xor/shifts/popcount)",
    scale="""
    Pure codegen'd projections over a pushed-down key-range scan — the
    bitwise family is what bucket ids, bloom probes and simhash bands
    compile to, so it stays JVM-side by construction; no shuffle, no
    Python.
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators over a pruned key range."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.col("o_custkey")).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcnt"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (SELECT doc_id,
                      'https://' || source || '.example.com/docs/'
                        || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
               FROM documents WHERE doc_id < 200)
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param
    FROM u
    """,
    survey="B20 extension (URL parsing — parse_url host/path/query, the "
    "web-corpus curation substrate)",
    scale="""
    parse_url is a codegen'd JVM expression (no UDF): extracting
    host/path/query from trillions of crawl URLs stays inside
    whole-stage codegen, pipelined with the scan. Host extraction is the
    canonical first step of URL-keyed dedup and per-domain quality
    rollups; the projection prunes to the three columns read.
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction over synthesized document URLs."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    d = d.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
