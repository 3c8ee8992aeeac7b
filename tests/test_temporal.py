"""Unit semantics of the temporal join operators (operators/temporal.py):
inclusive backward match, left-outer nulls, tolerance masking, collision
guard, and bucket-boundary coverage of the range join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),
            (2, "u1", "2024-01-01 12:00:00"),
            (3, "u2", "2024-01-01 09:00:00"),  # before any right row
            (4, "u3", "2024-01-01 10:00:00"),  # key missing on right
        ],
        "lid int, k string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 09:30:00", 100),
            ("u1", "2024-01-01 12:00:00", 200),  # equal ts → inclusive match
            ("u2", "2024-01-01 11:00:00", 300),
        ],
        "k string, ts string, rv int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_asof_backward_inclusive(spark, sides):
    left, right = sides
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert got == {1: 100, 2: 200, 3: None, 4: None}


def test_asof_tolerance_masks_stale(spark, sides):
    left, right = sides
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(left, right, on="k", tolerance_seconds=600).collect()
    }
    # lid=1 gap is 30 min > 600 s → masked; lid=2 exact match kept
    assert got == {1: None, 2: 200, 3: None, 4: None}


def test_asof_rejects_column_collision(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lid"), on="k")


def test_range_join_bucket_boundaries(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:59:59"),
         (3, "2024-01-01 11:00:00"), (4, "2024-01-01 09:59:59")],
        "event_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    iv = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "window_id int, start_ts string, end_ts string",
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp")).withColumn(
        "end_ts", F.col("end_ts").cast("timestamp")
    )
    # [10:00, 11:00): includes the start instant, excludes the end instant
    got = sorted(
        r["event_id"]
        for r in range_join_bucketed(events, iv, bucket_seconds=3600).collect()
    )
    assert got == [1, 2]


def test_connected_components_known_graph(spark):
    from flight_radar_pipeline_spark.operators.graph import connected_components

    # two components: {1,2,3,9} (chain 1-2, 2-3, 3-9) and {5,6}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6)], "id_a bigint, id_b bigint"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
