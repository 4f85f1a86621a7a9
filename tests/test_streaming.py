"""Streaming-specific behavior: checkpointed restart, watermark sink."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _run_stream(spark, sf_dir, checkpoint, sink):
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink)


def test_checkpointed_restart_processes_nothing_new(spark, sf_dir):
    """Second availableNow run over the same checkpoint sees no new data
    (exactly-once source bookkeeping)."""
    checkpoint = tempfile.mkdtemp(prefix="mrs_restart_ckpt_")
    first = _run_stream(spark, sf_dir, checkpoint, "restart_sink_a").collect()
    assert len(first) > 0
    second = _run_stream(spark, sf_dir, checkpoint, "restart_sink_b").collect()
    # complete-mode memory sink of run 2 holds no batches: nothing replayed
    assert len(second) == 0


def test_stream_batch_twin_equivalence(spark, sf_dir):
    """The streamed tumbling counts equal the batch window() counts."""
    from mrs_mapreduce_spark.catalog import table

    checkpoint = tempfile.mkdtemp(prefix="mrs_twin_ckpt_")
    streamed = {
        (r.w.start, r.cnt)
        for r in _run_stream(
            spark, sf_dir, checkpoint, "twin_sink"
        ).collect()
    }
    batch = {
        (r.w.start, r.cnt)
        for r in table(spark, sf_dir, "events")
        .groupBy(F.window(F.expr("timestamp_micros(ts_ns div 1000)"), "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert streamed == batch
