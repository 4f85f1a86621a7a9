"""JSON functions (B25) over the ``events.props`` JSON-in-string column.

Capability parity: ``json.loads`` inside a Mrs map (SURVEY.md §2.B).
Engine form: ``get_json_object`` (path extraction) and ``from_json``
(schema-full parse to a struct) — both JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                THEN TRUE ELSE FALSE END AS has_k,
           CAST(json_extract_string(props, '$.missing') AS INT) AS k_missing
    FROM events
    """,
    survey="B25",
    scale="""
    Path extraction avoids a full parse per field; for many fields,
    from_json to a struct once and project — one parse, columnar after.
    At 100 TB: parse JSON once at ingest, persist typed columns.
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction both ways: path string and typed struct parse."""
    ev = table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        parsed.getField("k").alias("k_struct"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10
                AS INT) AS k_decade,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract_string(props, '$.k') AS INT))
                AS INT) AS k_min,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT))
                AS INT) AS k_max
    FROM events
    GROUP BY 1
    """,
    survey="B25 extension (Spark 4 VARIANT: open-schema JSON columns)",
    scale="""
    VARIANT is Spark 4's answer to schema-drifting JSON: parse_json once
    at ingest into a binary-encoded open type, then variant_get paths
    evaluate WITHOUT re-parsing the string per access — unlike
    get_json_object, which re-parses per call. Shredded storage
    (variantShredding writes hot paths as real parquet columns) restores
    pushdown/pruning for the common fields while keeping the long tail.
    At 100 TB: persist props as VARIANT (or shredded), keep string JSON
    only at the very edge of ingest. The aggregate result here is plain
    typed columns, so the oracle stays exact.
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props through VARIANT: parse once, typed path extraction."""
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select(k.alias("k"))
        # `k div 10`, not floor(k/10): DuckDB's integer `//` truncates
        # toward zero (probed r12: -17 // 10 = -1), exactly like Spark's
        # `div` -- floor would give -2 and diverge on every negative k.
        # A negative-k row in the stress fixture pins this corner.
        .groupBy(F.expr("k div 10").cast("int").alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )
