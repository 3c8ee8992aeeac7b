"""Exactly-once rollup maintenance across failures: (a) a replayed
microbatch must not double-merge (the additive-partials hazard), and
(b) a real kill-and-restart from the checkpoint must converge to the
batch answer."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from flight_radar_pipeline_spark.streaming.events import (
    idempotent_rollup_merge,
)

SF_DIR = "/root/testdata/sf0.001"


def _delta_agg(batch):
    return batch.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )


def test_replayed_batch_is_skipped(spark, tmp_path):
    work = str(tmp_path / "rollup")
    merge_batch, read_final = idempotent_rollup_merge(
        spark, work, ["g"], ["n", "s"], _delta_agg
    )
    b0 = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "g int, v int")
    b1 = spark.createDataFrame([(1, 1), (3, 7)], "g int, v int")
    merge_batch(b0, 0)
    merge_batch(b1, 1)
    merge_batch(b1, 1)  # crash-replay of the last batch
    merge_batch(b0, 0)  # stale replay of an old batch
    got = {r.g: (r.n, r.s) for r in read_final(spark).collect()}
    assert got == {1: (3, 31), 2: (1, 5), 3: (1, 7)}


def test_checkpoint_restart_converges_to_batch(spark, tmp_path):
    # stage the events feed as 3 separate files so the stream has 3
    # microbatches to process one at a time
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    feed_dir = str(tmp_path / "feed")
    events.withColumn(
        "__f", F.col("event_id") % 3
    ).repartition("__f").write.partitionBy("__f").mode("overwrite").parquet(
        feed_dir
    )

    work = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def delta_agg(batch):
        return batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100)).cast("bigint").alias(
                "cents"
            ),
        )

    merge_batch, read_final = idempotent_rollup_merge(
        spark, work, ["event_type"], ["n_events", "cents"], delta_agg
    )

    def start():
        stream = (
            spark.readStream.schema(
                spark.read.parquet(feed_dir).schema
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(feed_dir)
        )
        return (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # first run: kill after at least one batch committed
    q = start()
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(
            d.startswith("b") and os.path.exists(f"{work}/{d}/_DONE")
            for d in (os.listdir(work) if os.path.isdir(work) else [])
        ):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    # second run: resume from the same checkpoint to completion
    q2 = start()
    q2.awaitTermination(300)

    got = {
        r.event_type: (r.n_events, r.cents)
        for r in read_final(spark).collect()
    }
    want = {
        r.event_type: (r.n_events, r.cents)
        for r in spark.read.parquet(feed_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100)).cast("bigint").alias(
                "cents"
            ),
        )
        .collect()
    }
    assert got == want
