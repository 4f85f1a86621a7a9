"""Stateful streaming: dedup (C5) and arbitrary per-key state (C6).

``stream_dedup`` declares the deterministic batch twin of
``dropDuplicatesWithinWatermark`` (keep the earliest event per key — the
plain ``dropDuplicates`` keeps an arbitrary one, which can never pass a
value oracle). ``stream_stateful`` runs a REAL
``applyInPandasWithState`` streaming query — the reference's closest
analogue is the user-managed accumulator inside a reduce, but with
framework-managed fault-tolerant state.
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import table
from ..registry import register


@register(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id
    FROM (SELECT user_id, event_type, event_id,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY epoch_ns(ts), event_id) AS rn
          FROM events)
    WHERE rn = 1
    """,
    survey="C5 (stateful dedup — deterministic batch twin)",
    scale="""
    Streaming form: dropDuplicatesWithinWatermark(["user_id",
    "event_type"]) keeps one row per key with state retired at the
    watermark. Batch twin keeps the EARLIEST (rank-limited window, one
    shuffle, WindowGroupLimit pushdown) because "an arbitrary row" is not
    a testable contract. At 100 TB the streaming state is one row per
    live key within the watermark horizon.
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest event per (user, event_type) — deterministic dedup."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_ns", "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", F.col("event_id").alias("first_event_id")
        )
    )


@register(
    "stream_stateful",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_val
    FROM events GROUP BY user_id
    """,
    survey="C6 (arbitrary stateful streaming: applyInPandasWithState)",
    scale="""
    Arbitrary per-key state with framework-managed fault tolerance: state
    lives in the state store (RocksDB at scale), keyed by user, updated
    per micro-batch. With Trigger.AvailableNow and in-order data the
    final state equals the batch aggregate — which is exactly what the
    oracle checks. The custom-state path is for logic groupBy can't
    express (sessionization with side conditions, CEP, model state);
    everything algebraic should stay in built-in aggregates.
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via a real applyInPandasWithState stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..session import apply_runtime_confs

    apply_runtime_confs(spark)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )

    def totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_val": [s]}
        )

    result = stream.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType="user_id bigint, n_events bigint, sum_val double",
        stateStructType="n bigint, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink_name = "mrs_stream_stateful_sink"
    checkpoint = tempfile.mkdtemp(prefix="mrs_state_ckpt_")
    query = (
        result.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    # one update row per user per micro-batch: keep the final state
    snap = spark.table(sink_name)
    from ..exprs import pround

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        snap.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", pround("sum_val", 2).alias("sum_val"))
    )
