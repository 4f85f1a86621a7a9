"""CSV and JSON sink⇆source round-trips.

Capability parity: ``mrs/fileformats.py`` writer/reader pairs (A3/A4) —
the reference proves formats by round-tripping pairs through them; these
queries do the same through Spark's CSV/JSON sources with explicit
schemas (schema inference is banned at scale: it costs an extra full
read and can drift between runs).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "sink_csv_roundtrip",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS bal
    FROM customer GROUP BY c_nationkey
    """,
    survey="A3/A4 (CSV writer/reader round-trip)",
    scale="""
    CSV is the interchange sink, never the analytical store: row-oriented,
    no pushdown, no types without an explicit schema. Values written here
    are pre-rounded, so the decimal text round-trips to the identical
    double. One file per partition, same contract as the reference's
    part-files.
    """,
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → CSV (header) → read back with explicit schema."""
    agg = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            pround(F.sum("c_acctbal"), 2).alias("bal"),
        )
    )
    target = tempfile.mkdtemp(prefix="mrs_sink_csv_") + "/cust_agg"
    agg.write.mode("overwrite").option("header", True).csv(target)
    return spark.read.schema(
        "c_nationkey int, n_cust bigint, bal double"
    ).option("header", True).csv(target)


@register(
    "sink_json_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_val
    FROM events GROUP BY event_type
    """,
    survey="A3/A4 (JSON-lines writer/reader round-trip)",
    scale="""
    JSON-lines: self-describing interchange, splittable per line — fine
    for event feeds, 10-50x the parquet scan cost for analytics. Explicit
    schema on read keeps types stable and skips inference's extra pass.
    """,
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → JSON lines → read back with explicit schema."""
    agg = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            pround(F.sum("value"), 2).alias("sum_val"),
        )
    )
    target = tempfile.mkdtemp(prefix="mrs_sink_json_") + "/events_agg"
    agg.write.mode("overwrite").json(target)
    return spark.read.schema(
        "event_type string, cnt bigint, sum_val double"
    ).json(target)


@register(
    "sink_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    survey="A3/A4 (ORC columnar writer/reader round-trip)",
    scale="""
    ORC is the second columnar format Spark ships natively (vectorized
    reader, predicate pushdown, zlib/zstd stripes) — interop surface for
    Hive-era lakes. Same footprint discipline as parquet: columnar
    stripes, stats-based skipping. The oracle aggregates the ORIGINAL
    parquet table in DuckDB, so the check proves the ORC round-trip
    preserved every value bit-for-bit.
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate → ORC → read back and return."""
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            pround(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    target = tempfile.mkdtemp(prefix="mrs_sink_orc_") + "/orders_agg"
    agg.write.mode("overwrite").orc(target)
    return spark.read.orc(target)


@register(
    "source_text_lines",
    oracle="""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents)
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM w WHERE word <> ''
    GROUP BY word HAVING count(*) >= 100
    """,
    survey="A1 (line-oriented text source — the reference's primary input)",
    scale="""
    spark.read.text is the schema-free scan the reference's file_data
    serves: one line per row, splittable per HDFS block, parallelism =
    input splits exactly like the reference's one-source-per-file model
    but without its file-count = task-count coupling. Everything after
    the scan is the standard partial-aggregated wordcount; at 100 TB the
    text scan's only knob is maxPartitionBytes, and the HAVING threshold
    pushes nothing (aggregation needs full counts) — the shuffle carries
    |vocab| partial sums, not occurrences.
    """,
)
def source_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text -> .txt files -> spark.read.text -> wordcount."""
    docs = table(spark, sf_dir, "documents").select("text")
    target = tempfile.mkdtemp(prefix="mrs_src_text_") + "/docs_txt"
    # one line per document; text sink forbids newlines in values, and the
    # fixture corpus has none (single-line documents)
    docs.write.mode("overwrite").text(target)
    lines = spark.read.text(target)  # schema: value: string
    return (
        lines.select(F.explode(F.split(F.col("value"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 100)
    )


@register(
    "sink_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice * 1.1, 2) AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0),
    merged AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
        UNION ALL
        SELECT o.o_orderkey, o.o_orderstatus,
               round(o.o_totalprice, 2) AS o_totalprice
        FROM orders o
        WHERE o.o_orderkey % 10 <> 0)
    SELECT o_orderstatus, count(*) AS n,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
    FROM merged GROUP BY o_orderstatus
    """,
    survey="A4 extension (MERGE/upsert semantics on immutable parquet)",
    scale="""
    Upsert without a table format: updates take precedence via
    updates UNION ALL (base ANTI-JOIN updates) — here the anti-join is a
    pushed-down key predicate because the update set is rule-defined,
    and in the general case it is a broadcast anti-join on the upsert
    keys. At 100 TB partition the base by a stable key range and
    rewrite ONLY partitions containing upsert keys
    (partition-overwrite-mode=dynamic), which is exactly what table
    formats automate; the relational core stays this plan.
    """,
)
def sink_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a 10%-price update batch over orders with update precedence."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    is_upd = F.col("o_orderkey") % 10 == 0
    updates = o.filter(is_upd).withColumn(
        "o_totalprice", pround(F.col("o_totalprice") * 1.1, 2)
    )
    merged = updates.unionByName(
        o.filter(~is_upd).withColumn(
            "o_totalprice", pround(F.col("o_totalprice"), 2)
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "sink_schema_evolution",
    oracle="""
    WITH v1 AS (SELECT o_orderkey, o_orderstatus,
                       round(o_totalprice, 2) AS price
                FROM orders WHERE o_orderkey % 2 = 0),
    v2 AS (SELECT o_orderkey, o_orderstatus,
                  round(o_totalprice, 2) AS price,
                  o_orderpriority
           FROM orders WHERE o_orderkey % 2 = 1),
    unified AS (
        SELECT o_orderkey, o_orderstatus, price,
               CAST(NULL AS VARCHAR) AS o_orderpriority FROM v1
        UNION ALL
        SELECT o_orderkey, o_orderstatus, price, o_orderpriority FROM v2)
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(o_orderpriority) AS BIGINT) AS n_with_priority,
           round(CAST(sum(price) AS DOUBLE), 2) AS total
    FROM unified GROUP BY o_orderstatus
    """,
    survey="A4 extension (schema evolution: widening append + mergeSchema)",
    scale="""
    The schema-drift reality of long-lived tables: an early writer lacks
    a column a later writer adds. Parquet handles widening appends
    structurally — each file carries its own schema; the read unifies
    them with mergeSchema=true, NULL-filling the missing column.
    mergeSchema costs one footer read PER FILE at planning time, so at
    100 TB/millions of files pin the unified schema in a metastore (or
    table format) and pass it explicitly — the plan below is identical
    from the scan up. Writers must only WIDEN (add nullable columns);
    renames/retypes need a rewrite, which is why table formats version
    schemas.
    """,
)
def sink_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v1 (3 cols) + v2 (4 cols) appends, mergeSchema read, NULL audit."""
    import tempfile

    orders = table(spark, sf_dir, "orders")
    target = tempfile.mkdtemp(prefix="mrs_schevo_") + "/t"
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", pround("o_totalprice", 2).alias("price")
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        pround("o_totalprice", 2).alias("price"),
        "o_orderpriority",
    )
    v1.write.mode("overwrite").parquet(target)
    v2.write.mode("append").parquet(target)
    back = spark.read.option("mergeSchema", "true").parquet(target)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("n_with_priority"),
        pround(F.sum("price"), 2).alias("total"),
    )


@register(
    "sink_compaction",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="A4 extension (small-file compaction rewrite)",
    scale="""
    The small-files disease: streaming/partitioned writers fragment a
    table into files far below the scan-efficient size, and every query
    pays per-file open/footer/seek overhead. The cure is a periodic
    rewrite: read fragmented, repartition to ceil(bytes / target_file_
    bytes), write back — one round-robin shuffle whose only job is
    output geometry. Spark 4 can do it statement-level via AQE
    advisoryPartitionSizeInBytes on the final exchange; explicit
    repartition keeps the file count deterministic for the test, which
    asserts the 64 -> 4 collapse AND content equality. At 100 TB
    compact per partition-directory, newest partitions first (they
    fragment; closed ones don't), and prefer a table format's
    transactional rewrite when concurrent readers exist.
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment lineitem into 64 files, compact to 4, audit the content."""
    import tempfile

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    base = tempfile.mkdtemp(prefix="mrs_compact_")
    frag, compact = f"{base}/frag", f"{base}/compact"
    li.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(
        compact
    )
    return (
        spark.read.parquet(compact)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@register(
    "source_csv_permissive",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
    FROM customer WHERE c_custkey < 100
    """,
    survey="A3 extension (malformed-input handling: PERMISSIVE CSV parse "
    "with corrupt-record capture — bad rows are quarantined, never "
    "dropped silently and never fatal)",
    scale="""
    Real 100 TB ingest always contains garbage rows; the three parse
    modes are the contract: FAILFAST (abort), DROPMALFORMED (silent
    loss), PERMISSIVE + columnNameOfCorruptRecord (what this query
    exercises — typed columns go NULL and the raw line lands in the
    corrupt column, so bad input is routed to a quarantine sink and
    audited, exactly like fileformats' error-channel discipline). The
    parse is per-line and pipelined with the scan; the corrupt-row
    split costs nothing extra. The declared result is the clean
    relation, hash-equal to the source rows that made the round trip;
    the 3 injected corrupt lines are asserted quarantined in
    test_smoke.
    """,
)
def source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV with injected garbage: parse PERMISSIVE, return clean rows."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select("c_custkey", "c_name", pround("c_acctbal", 2).alias("bal"))
    )
    lines = cust.select(
        F.concat_ws(
            ",", "c_custkey", "c_name", F.col("bal").cast("string")
        ).alias("value")
    )
    bad = spark.createDataFrame(
        [("not_a_key,Garbage#1,not_a_number",),
         ("99999,Too#Many,1.0,extra,columns",),
         ("###",)],
        "value string",
    )
    target = tempfile.mkdtemp(prefix="mrs_csv_perm_") + "/cust_dirty"
    lines.unionByName(bad).write.mode("overwrite").text(target)
    back = (
        spark.read.schema(
            "c_custkey bigint, c_name string, bal double, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(target)
        # Spark forbids queries whose only referenced CSV column is the
        # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — a
        # downstream .count() prunes the data columns and hits exactly
        # that (caught by the round-4 synthetic sweep; collect() happened
        # to work). Materializing the parsed batch is Spark's documented
        # contract for corrupt-record queries AND the real semantics of a
        # quarantine pass: parse once, then route clean/corrupt rows.
        .localCheckpoint(eager=True)
    )
    return back.filter(F.col("_corrupt").isNull()).select(
        "c_custkey", "c_name", "bal"
    )
