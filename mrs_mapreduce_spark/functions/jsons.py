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
