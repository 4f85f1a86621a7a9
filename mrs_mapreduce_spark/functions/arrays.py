"""Array and map functions, including higher-order lambdas (B23/B24).

Capability parity: Python lists/dicts inside Mrs values (SURVEY.md §2.B).
Engine form: Spark higher-order functions (transform / aggregate /
zip_with) evaluate lambdas INSIDE codegen — array math at JVM speed with
no Python worker. Float discipline: elements are cast to double before
arithmetic on BOTH sides so the accumulation sequence is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..exprs import pround, pround0
from ..registry import register


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) + 0.0 AS first_val,
           round(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum'), 6) + 0.0 AS vsum,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6)
               AS l2,
           round(CAST(list_max(embedding) AS DOUBLE), 6) + 0.0 AS vmax,
           round(CAST(list_min(embedding) AS DOUBLE), 6) + 0.0 AS vmin,
           len(list_filter(embedding, x -> x > 0)) AS n_pos
    FROM embeddings
    """,
    survey="B23 (higher-order array functions)",
    scale="""
    transform/aggregate/filter lambdas run inside codegen over the array
    — the embedding hot path stays JVM-side. 64-float vectors: ~256 B/row;
    at 100 TB keep vectors columnar (parquet list) and never explode them
    for per-element math.
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over 64-dim embedding vectors."""
    e = table(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    squared = F.transform(
        "embedding", lambda x: x.cast("double") * x.cast("double")
    )
    acc = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda a, x: a + x
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        # pround0: embedding values are ~N(0, 0.1), so every one of
        # these is an informative float whose true value can be near 0
        # -- the negzero-gate class (r11 functions review)
        pround0(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_val"
        ),
        pround0(acc(as_double), 6).alias("vsum"),
        pround(F.sqrt(acc(squared)), 6).alias("l2"),
        pround0(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        pround0(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT doc_id,
           lang AS m_lang,
           2 AS n_keys,
           'lang,source' AS keys_csv,
           concat(lang, '|', source) AS vals_joined
    FROM documents
    """,
    survey="B24",
    scale="MapType construction/extraction is codegen'd; maps stay columnar.",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value extraction (element_at, map_keys)."""
    d = table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(m, "lang").alias("m_lang"),
        F.size(m).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.array_join(F.map_values(m), "|").alias("vals_joined"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS s_status,
           round(o_totalprice, 2) AS s_price,
           CAST(o_totalprice > 200000 AS BOOLEAN) AS s_big,
           concat(o_orderstatus, '#', CAST(o_orderkey AS VARCHAR)) AS packed
    FROM orders WHERE o_orderkey < 1000
    """,
    survey="B2 (struct construction/field extraction)",
    scale="""
    Structs are zero-cost column grouping: parquet stores fields as
    independent columns, pruning reaches through them (see multimodal
    meta struct). Output flattens fields — the driver hash compares
    scalars, and flattened vs nested is the same bytes columnar-side.
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a struct, extract fields, serialize a composite key."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        pround("o_totalprice", 2).alias("price"),
        (F.col("o_totalprice") > 200000).alias("big"),
    )
    return o.select(
        "o_orderkey",
        s.getField("status").alias("s_status"),
        s.getField("price").alias("s_price"),
        s.getField("big").alias("s_big"),
        F.concat_ws("#", "o_orderstatus", F.col("o_orderkey").cast("string")).alias(
            "packed"
        ),
    )
