"""Streaming operators over the events table shape
(event_id, ts, user_id, event_type, value, props).

All three operators run identically under ``readStream`` (file source,
``trigger(availableNow=True)`` in tests) and would run against Kafka at
scale — the plans are source-agnostic. Watermarks bound state: at 100 TB/day
the window/session state is partitioned by (user_id | window) across
executors and expired by the watermark, so state size is O(active keys),
not O(history).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long,"
                 " event_type string, value double, props string")


def read_events_stream(spark: SparkSession, path: str,
                       max_files: int = 4) -> DataFrame:
    """File-source stream over parquet events (Kafka stand-in)."""
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files)
            .parquet(path))


def windowed_counts(events: DataFrame, window: str = "10 minutes",
                    watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts + value sums per event_type, late data beyond
    the watermark dropped."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"),
                    "event_type", "n", "sum_value"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user via the built-in session_window —
    the streaming twin of relops.sessionize_events."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("sess_start"),
                    F.col("w.end").alias("sess_end"), "n_events"))


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-user
    event count + max value across micro-batches. Demonstrates the
    arbitrary-state API the reference-class engines lack."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, vmax = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        state.update((n, vmax))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                            "max_value": [vmax]})

    return (events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, max_value double",
        stateStructType="n long, vmax double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))
