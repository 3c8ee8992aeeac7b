"""Structured Streaming over the event feed.

The reference simulates "real-time" with an hourly Prefect batch
(``/root/reference/src/main.py:156``; SURVEY.md §2.8 — no streaming at
all). Here the same hourly aggregation is a real incremental plan:
file-source → event-time tumbling window + watermark → sink. The batch
query (plans/battery.py ``hourly_event_counts``) and this stream share
semantics — the streaming run at `availableNow` must produce exactly the
batch answer, which is how the oracle checks it.

Scale posture: the stateful window agg is keyed on (window, event_type);
the 1-hour watermark bounds state. On a cluster this runs with RocksDB
state store and per-microbatch admission via ``maxFilesPerTrigger``.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# physical schema of events.parquet under nanosAsLong (see sources/readers.py)
EVENTS_PHYSICAL = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),  # int64 nanos
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet, with the nanos→timestamp
    normalization applied.

    The file source requires a *directory* (its PartitioningAwareFileIndex
    insists basePath is a directory even when handed one concrete file), so
    a bare-file path is staged as a symlink inside a scratch directory —
    exactly how a production feed presents an append-only drop folder.
    """
    if os.path.isfile(path):
        stage = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(os.path.abspath(path), os.path.join(stage, os.path.basename(path)))
        path = stage
    stream = spark.readStream.schema(EVENTS_PHYSICAL).parquet(path)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event-time window: count + value sum per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


def run_stream_to_memory(
    result: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame to completion (`availableNow`) into a
    memory sink; return the materialized result as a batch DataFrame.

    ``complete`` mode emits the full aggregate each commit, so the final
    table equals the batch answer regardless of watermark progress (append
    mode would hold back unfinalized windows at end-of-stream).
    """
    name = f"stream_result_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return result.sparkSession.table(name)
