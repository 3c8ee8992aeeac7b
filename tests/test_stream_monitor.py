"""BatchMetricsListener: per-batch telemetry capture with exact row
accounting, state-operator visibility, and guaranteed deregistration."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from flight_radar_pipeline_spark.streaming.monitor import attach_listener


def _run_counted_stream(spark, src_dir, name):
    q = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _wait_for(pred, timeout_s=30):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.2)  # listener bus is async to query termination
    return False


def test_listener_accounts_for_every_input_row(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(400).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    ).repartition(3).write.parquet(src)

    with attach_listener(spark) as lis:
        _run_counted_stream(spark, src, "mon_t1")
        assert _wait_for(
            lambda: sum(r["num_input_rows"] for r in lis.snapshot()) == 400
        ), lis.snapshot()
        recs = [r for r in lis.snapshot() if r["query_name"] == "mon_t1"]
        assert sum(r["num_input_rows"] for r in recs) == 400
        # stateful agg → state rows visible once populated
        assert max(r["state_rows"] for r in recs) == 7
        assert all(r["batch_duration_ms"] is not None for r in recs)
        df = lis.to_df(spark)
        assert df.where(df.query_name == "mon_t1").count() == len(recs)


def test_listener_is_removed_on_exit(spark, tmp_path):
    src = str(tmp_path / "src2")
    spark.range(10).select(F.col("id"), F.lit(0).alias("k")).write.parquet(src)
    with attach_listener(spark) as lis:
        pass
    _run_counted_stream(spark, src, "mon_t2")
    time.sleep(1.0)
    assert all(r["query_name"] != "mon_t2" for r in lis.snapshot())
