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


def transform_with_state_available() -> bool:
    """True when transformWithStateInPandas can actually run here.

    The Spark 4 API talks to a JVM state server over a protobuf
    protocol from a driver-side Python worker; without google.protobuf
    the worker crashes at query start (STREAMING_PYTHON_RUNNER_
    INITIALIZATION_FAILURE), so the capability gate is the import.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


_TOTALS_OUT = "user_id bigint, n_events bigint, sum_val double"


def _totals_transform_with_state(stream: DataFrame) -> DataFrame:
    """Spark 4 transformWithStateInPandas formulation (primary path)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_val": [s]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=_TOTALS_OUT,
        outputMode="Update",
        timeMode="None",
    )


def _totals_apply_in_pandas(stream: DataFrame) -> DataFrame:
    """applyInPandasWithState fallback — identical per-key semantics."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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

    return stream.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType=_TOTALS_OUT,
        stateStructType="n bigint, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_stateful",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_val
    FROM events GROUP BY user_id
    """,
    survey="C6 (arbitrary stateful streaming: Spark 4 "
    "transformWithStateInPandas, applyInPandasWithState fallback)",
    scale="""
    Arbitrary per-key state with framework-managed fault tolerance.
    Primary path is the Spark 4 transformWithState API (SURVEY.md §2.C
    C6's named target; supersedes applyInPandasWithState): typed
    ValueState in the RocksDB state store, keyed by user, updated per
    micro-batch — the API adds composable typed state variables,
    timers, and state schema evolution over the old single-tuple
    state. Its state-server protocol needs google.protobuf, which this
    container lacks, so the builder gates on that import and falls
    back to applyInPandasWithState with IDENTICAL semantics (the
    batch-twin oracle pins both). With Trigger.AvailableNow and
    in-order data the final state equals the batch aggregate — which
    is exactly what the oracle checks. The custom-state path is for
    logic groupBy can't express (sessionization with side conditions,
    CEP, model state); everything algebraic should stay in built-in
    aggregates.
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals via a real stateful streaming query."""
    from ..session import apply_runtime_confs

    apply_runtime_confs(spark)
    # events_stream handles BOTH physical layouts (fixture single-file
    # via parent-glob, Spark-written directory via direct path) — an
    # inline glob here silently read zero rows on directory-shaped
    # tables (round-4 synthetic-sweep find)
    from .source import events_stream

    stream = events_stream(spark, sf_dir)
    use_tws = transform_with_state_available()
    result = (
        _totals_transform_with_state(stream)
        if use_tws
        else _totals_apply_in_pandas(stream)
    )
    sink_name = "mrs_stream_stateful_sink"
    checkpoint = tempfile.mkdtemp(prefix="mrs_state_ckpt_")
    # transformWithState requires the RocksDB state store (the provider it
    # was designed around); scope the conf to this query's start and
    # restore so co-resident HDFS-state queries keep their checkpoints.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(provider_key, None)
    if use_tws:
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    try:
        query = (
            result.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        finished = query.awaitTermination(180)
        if not finished:
            query.stop()
            raise TimeoutError(
                "stream_stateful: availableNow batch did not finish in "
                "180s; memory sink would be partial — failing loudly instead"
            )
    finally:
        if use_tws:
            if prev_provider is None:
                spark.conf.unset(provider_key)
            else:
                spark.conf.set(provider_key, prev_provider)
    # one update row per user per micro-batch: keep the final state
    snap = spark.table(sink_name)
    from ..exprs import pround

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        snap.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", pround("sum_val", 2).alias("sum_val"))
    )


@register(
    "join_interval_events",
    oracle="""
    SELECT p.event_id AS purchase_id,
           s.event_id AS signup_id,
           p.user_id,
           CAST(epoch_ns(p.ts) // 1000 - epoch_ns(s.ts) // 1000
                AS BIGINT) AS gap_us
    FROM events p
    JOIN events s
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase'
     AND s.event_type = 'signup'
     AND epoch_ns(s.ts) // 1000 <= epoch_ns(p.ts) // 1000
     AND epoch_ns(s.ts) // 1000 > epoch_ns(p.ts) // 1000 - 3600000000
    """,
    survey="C (stream-stream interval join — batch twin) / B8",
    scale="""
    The time-bounded self-join IS Spark's stream-stream join in batch
    clothing: equi-key (user_id) plus an event-time interval. In
    streaming the same plan runs with watermarks on both sides and the
    interval bound sizes the join state (each side retains only rows
    inside watermark + interval). Integer-nanos bounds; gap reported in
    microseconds (DuckDB's ns truncation, see join_asof).
    """,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to same-user signups within the preceding hour."""
    ev = table(spark, sf_dir, "events")
    # microsecond space on BOTH sides: DuckDB truncates parquet ns to us
    # PER VALUE, so diffs/bounds must be computed on truncated values too
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.expr("ts_ns div 1000").alias("p_us"),
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.expr("ts_ns div 1000").alias("s_us"),
    )
    hour_us = 3_600_000_000
    return (
        p.join(
            s,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("s_us") <= F.col("p_us"))
            & (F.col("s_us") > F.col("p_us") - hour_us),
        )
        .select(
            "purchase_id",
            "signup_id",
            "user_id",
            (F.col("p_us") - F.col("s_us")).alias("gap_us"),
        )
    )
