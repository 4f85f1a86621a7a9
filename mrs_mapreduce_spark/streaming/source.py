"""Streaming source for the events fixture, layout-normalized.

The batch-side twin of this normalization lives in ``catalog.table``:
whatever the parquet physical layout of ``events.ts`` — TIMESTAMP(NANOS)
read as int64 via ``nanosAsLong`` (round-1 fixtures) or TIMESTAMP(MICROS)
read as timestamp/ntz (round-2 fixtures) — the stream exposes

- ``ts``   : plain TIMESTAMP (not NTZ — ``withWatermark`` rejects NTZ;
  the session zone is pinned UTC so the instant equals the naive value),
- ``ts_ns``: exact epoch-nanos int64, the unit the DuckDB oracles use
  (``epoch_ns``), kept integer end-to-end so no double rounding occurs.

Scale note: schema is passed explicitly (required by file streaming
sources) and the per-file source lists the directory once per trigger;
on a real deployment the same column contract comes from Kafka +
``from_json``/``from_avro`` — only the first two lines change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet with ``ts``/``ts_ns`` contract."""
    import os

    apply_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    # (sf_dir, mtime)-keyed schema memo, same discipline as catalog.table:
    # the batch read below costs ~95 ms of driver time per call, and the
    # dual-stream join builders call this twice per query build — the
    # fixture schema is immutable between mtimes, so probe it once
    memo = getattr(spark, "_mrs_stream_schema_memo", None)
    if memo is None:
        memo = {}
        spark._mrs_stream_schema_memo = memo
    # Memo key: for a single file, its mtime; for a DIRECTORY layout, the
    # sorted (relpath, mtime) of every file in the RECURSIVE walk — an
    # in-place overwrite of a same-named part file bumps the file's
    # mtime but not its parent directory's, and with partitioned layouts
    # (day=.../part-0.parquet) the stale file sits a level down, so a
    # top-level scandir is not enough (r9 ADVICE + r10 review). A failed
    # stat probe is NOT memoized: key None always misses, so the next
    # call re-probes instead of cache-hitting a previous failure.
    try:
        if os.path.isdir(path):
            entries = []
            for root, dirs, files in os.walk(path):
                dirs[:] = [x for x in dirs if not x.startswith((".", "_"))]
                for fname in files:
                    if fname.startswith((".", "_")):
                        continue
                    full = os.path.join(root, fname)
                    entries.append(
                        (os.path.relpath(full, path),
                         os.stat(full).st_mtime_ns)
                    )
            key = tuple(sorted(entries))
        else:
            key = os.stat(path).st_mtime_ns
    except OSError:
        key = None
    hit = memo.get(sf_dir)
    if hit is not None and key is not None and hit[0] == key:
        batch_schema = hit[1]
    else:
        batch_schema = spark.read.parquet(path).schema
        if key is not None:
            memo[sf_dir] = (key, batch_schema)
    # Two physical layouts exist: the driver fixtures ship events.parquet
    # as a single FILE (the streaming file source rejects a direct file
    # path, so glob down from the parent), while any Spark-written table
    # — including every production table at scale — is a DIRECTORY of
    # part files (where the old pathGlobFilter matched nothing and every
    # streaming query silently read ZERO rows; caught by the round-4
    # synthetic-tier sweep). Branch on the layout.
    if os.path.isdir(path):
        stream = spark.readStream.schema(batch_schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if batch_schema["ts"].dataType.simpleString() == "bigint":
        return stream.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(ts_ns div 1000)")
        )
    return stream.withColumn(
        "ts", F.expr("cast(ts as timestamp)")
    ).withColumn("ts_ns", F.expr("unix_micros(cast(ts as timestamp)) * 1000"))
