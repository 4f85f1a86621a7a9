"""Multimodal (binary) columns: typed payload + metadata + decode plumbing.

SURVEY.md §2.D D5. Design: media lives in opaque ``binary`` columns with a
typed metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The image/audio
codec libraries are not in this container, so the actual codec call is
STUBBED (``decode_frames(..., real_codec=True)`` raises
``NotImplementedError``); everything Spark-side — schema, batching, UDF
signature, partitioning — is real and tested, and the default deterministic
fake decode derives metadata arithmetically from the payload bytes so it
has an exact SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

#: result schema of the decode stage — what a real image decoder would emit
DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint, kind string"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Fixture documents → multimodal rows: binary payload + metadata struct.

    The payload is a deterministic 16-byte pseudo-image (md5 of the text);
    real pipelines read ``spark.read.format("binaryFile")`` or parquet
    binary columns — identical schema from there on.
    """
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.unhex(F.md5("text"))).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_frames(
    mm: DataFrame, real_codec: bool = False, batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched decode stage over binary payloads (mapInPandas).

    ``real_codec=True`` is the seam where PIL/ffmpeg would decode; those
    libraries are not available in this environment, so it raises.
    The default fake decode is deterministic arithmetic on the payload's
    first bytes — enough to exercise schema, batch shape and partitioning.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_codec:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg; not in container"
                )
            payloads = pdf["payload"]
            width = payloads.map(lambda b: b[0] % 64 + 16).astype("int32")
            height = payloads.map(lambda b: b[1] % 64 + 16).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "n_pixels": (width * height).astype("int64"),
                    "kind": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return mm.mapInPandas(decode, schema=DECODE_SCHEMA)


@register(
    "multimodal_struct",
    oracle="""
    SELECT doc_id,
           16 AS n_bytes,
           substr(md5(text), 1, 8) AS hex8,
           'image/fake' AS mime,
           source AS origin
    FROM documents
    """,
    survey="D5 (binary payload + typed metadata struct)",
    scale="""
    Binary stays opaque and columnar; metadata is a struct column so
    filters on mime/origin prune without touching payload bytes (parquet
    column pruning works through struct fields). At 100 TB payloads
    dominate bytes: partition by a metadata key, never shuffle payloads
    through a groupBy — aggregate metadata only.
    """,
)
def multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal row shape: scalar projections of payload + struct meta."""
    mm = attach_payload(table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 4))).alias("hex8"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.origin").alias("origin"),
    )


@register(
    "multimodal_decode",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1
                 AS byte0,
             (strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
             + strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1
                 AS byte1
      FROM documents)
    SELECT doc_id,
           CAST(byte0 % 64 + 16 AS INT) AS width,
           CAST(byte1 % 64 + 16 AS INT) AS height,
           CAST((byte0 % 64 + 16) * (byte1 % 64 + 16) AS BIGINT) AS n_pixels,
           'image/fake' AS kind
    FROM b
    """,
    survey="D5 (mapInPandas decode plumbing, deterministic fake codec)",
    scale="""
    The decode stage is where 100 TB multimodal pipelines live or die:
    Arrow-batched mapInPandas moves payload batches to Python once, emits
    small typed rows, and drops the binary immediately after — downstream
    stages shuffle metadata, not media. Batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch; oversized payloads get
    repartitioned by byte budget before this stage.
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stub through real mapInPandas plumbing, SQL-verifiable."""
    mm = attach_payload(table(spark, sf_dir, "documents"))
    return decode_frames(mm)
