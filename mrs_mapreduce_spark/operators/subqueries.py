"""Subquery shapes: scalar aggregates in predicates, positional explode.

Capability parity: a Mrs user runs the inner aggregation as a first MR
phase, broadcasts the scalar via the job driver, and filters in a second
map phase — here the scalar aggregate is a broadcast-joined single row
(what Catalyst also produces for an uncorrelated scalar subquery).
Correlated EXISTS/IN shapes are covered by join_semi/join_anti.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround
from ..registry import register


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
    """,
    survey="B1 (scalar-subquery predicate)",
    scale="""
    The scalar aggregate is one partial-aggregated pass producing a single
    row, broadcast onto the filter scan — two scans of orders, zero
    shuffles of it. Never collect the scalar to the driver inside the
    plan: the broadcast keeps the whole query lazy and retry-safe.
    Threshold 1.9 is fixture-calibrated (the price distribution tops out
    at ~2.0x the mean, so the original 2x threshold returned ZERO rows
    at every tier — a vacuous hash-of-nothing witness, caught by the
    round-4 synthetic sweep's zero-row audit; non-degeneracy now smoke-
    guarded).
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.9x the global average price."""
    orders = table(spark, sf_dir, "orders")
    avg_row = orders.agg(F.avg("o_totalprice").alias("avg_p"))
    return (
        orders.join(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > 1.9 * F.col("avg_p"))
        .select("o_orderkey", pround("o_totalprice", 2).alias("price"))
    )


@register(
    "map_explode_pos",
    oracle="""
    SELECT doc_id,
           generate_subscripts(ws, 1) AS pos,
           unnest(ws) AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE doc_id < 100)
    """,
    survey="A5 (1:n map with ordinal)",
    scale="""
    posexplode keeps the element ordinal without a window or join —
    narrow, pipelined. The ordinal is what downstream shingling/sequence
    ops key on, so emitting it at explode time saves a sort later.
    """,
)
def map_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode: (doc_id, 1-based position, word)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "word"
    )
