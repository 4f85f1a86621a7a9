"""Custom Spark data source for the Mrs hex pair format.

Capability parity: ``mrs/fileformats.py::HexReader`` (A3) promoted to a
first-class Spark source via the Spark 4 Python DataSource API — a Mrs
user's persisted hex datasets become ``spark.read.format("mrs_pairs")``
tables, planned and parallelized by Spark (one input partition per
part-file, matching the reference's one-bucket-per-file layout).

The lossless schema is ``key_hex/value_hex`` (hex-encoded pickles);
:func:`decode_pairs` bridges back to a pair RDD for the parity layer.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


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
        return [InputPartition(f) for f in files]

    def read(self, partition):
        with open(partition.value, encoding="ascii") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    key_hex, value_hex = line.split(" ", 1)
                    yield (key_hex, value_hex)


def register(spark: SparkSession) -> None:
    """Register the source with the session (idempotent)."""
    if not getattr(spark, "_mrs_pairsource", False):
        spark.dataSource.register(PairFileDataSource)
        spark._mrs_pairsource = True


def decode_pairs(df: DataFrame):
    """Hex-pickle columns → pair RDD (back into the parity layer)."""
    import pickle

    return df.rdd.map(
        lambda r: (
            pickle.loads(bytes.fromhex(r.key_hex)),
            pickle.loads(bytes.fromhex(r.value_hex)),
        )
    )
