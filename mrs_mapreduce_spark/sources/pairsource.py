"""Custom Spark data source for the Mrs hex pair format.

Capability parity: ``mrs/fileformats.py::HexReader`` (A3) promoted to a
first-class Spark source via the Spark 4 Python DataSource API — a Mrs
user's persisted hex datasets become ``spark.read.format("mrs_pairs")``
tables, planned and parallelized by Spark (one input partition per
part-file, matching the reference's one-bucket-per-file layout).

The lossless schema is ``key_hex/value_hex`` (hex-encoded pickles);
:func:`decode_pairs` bridges back to a pair RDD for the parity layer.

Filesystem contract (r10 sources review): this source plans with
``pathlib`` and reads with builtin ``open``, so the path must be a
LOCAL filesystem visible to driver AND executors (local mode, NFS, or
a fuse mount). For HDFS/object stores use ``fileformats.read_hex``
(``sc.textFile`` — Hadoop FS planning, no driver-side listing); the
two share one codec, so the choice is purely about where the bytes
live.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from ..registry import register


class PairFileDataSource(DataSource):
    """``spark.read.format("mrs_pairs").load(dir)`` over HexWriter output."""

    @classmethod
    def name(cls) -> str:
        return "mrs_pairs"

    def schema(self) -> str:
        return "key_hex string, value_hex string"

    def reader(self, schema) -> "PairFileReader":
        return PairFileReader(self.options)


class PairFileReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrs_pairs source requires a path")

    def partitions(self):
        files = sorted(
            str(p)
            for p in Path(self.path).glob("part-*")
            if not p.name.endswith(".crc")
        )
        if not files:
            # Fail fast and loud: an empty partition list makes Spark
            # substitute [None], and read(None) would die executor-side
            # with an opaque AttributeError that never mentions the bad
            # path (r10 sources review — the 'every drain loud' rule).
            raise FileNotFoundError(
                f"mrs_pairs: no part-* files under {self.path!r} "
                "(missing directory, empty dataset, or a non-local "
                "path — this source reads the LOCAL filesystem; use "
                "fileformats.read_hex for HDFS/object stores)"
            )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        from ..fileformats import hex_split_line

        with open(partition.value, encoding="ascii") as fh:
            for line in fh:
                if line.strip():
                    yield hex_split_line(line)


def register_source(spark: SparkSession) -> None:
    """Register the source with the session (idempotent).

    Also ships the package to executors: the reader's ``read()`` does a
    relative import of ``..fileformats`` EXECUTOR-side, so an external
    caller following the module docstring (register + spark.read on a
    cluster without the package installed on workers) would otherwise
    hit ModuleNotFoundError per task at collect time (r11 sources
    review — previously only the internal query builder shipped it).
    """
    if not getattr(spark, "_mrs_pairsource", False):
        from ..mapreduce import _ensure_code_shipped

        _ensure_code_shipped(spark.sparkContext)
        spark.dataSource.register(PairFileDataSource)
        spark._mrs_pairsource = True


def decode_pairs(df: DataFrame):
    """Hex-pickle columns → pair RDD (back into the parity layer)."""
    from ..fileformats import hex_decode_hexes

    return df.rdd.map(lambda r: hex_decode_hexes(r.key_hex, r.value_hex))


@register(
    "source_hex_pairs",
    oracle="""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
               FROM documents),
    wc AS (SELECT w, count(*) AS c FROM w WHERE w <> '' GROUP BY w)
    SELECT substr(w, 1, 1) AS letter,
           CAST(sum(c) AS BIGINT) AS total
    FROM wc GROUP BY 1
    """,
    survey="A3 (hex pair format as a first-class Spark data source)",
    scale="""
    The reference's persisted intermediate format promoted to a real
    source: the Python DataSource API plans one input partition per
    part-file (the reference's one-bucket-per-file layout), so a
    migrated Mrs dataset parallelizes exactly as it did — and from
    there the rows are ordinary DataFrame data. Hex/pickle decode is
    per-row Python (the format is inherently pickled); at scale
    convert once to parquet and keep this source for ingest only.
    """,
)
def _hex_source_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a hex pair dataset and read it back via the custom source."""
    import tempfile

    from pyspark.sql import functions as F

    from ..catalog import table
    from ..fileformats import write_hex
    from ..mapreduce import _ensure_code_shipped

    _ensure_code_shipped(spark.sparkContext)
    register_source(spark)
    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = words.rdd.map(lambda r: (r.w, int(r.c)))
    outdir = tempfile.mkdtemp(prefix="mrs_hexsrc_") + "/wc_hex"
    write_hex(pairs, outdir)

    back = spark.read.format("mrs_pairs").option("path", outdir).load()
    decoded = decode_pairs(back).map(
        lambda kv: (kv[0][:1], kv[1])
    )
    return (
        spark.createDataFrame(decoded, "letter string, c long")
        .groupBy("letter")
        .agg(F.sum("c").alias("total"))
    )


