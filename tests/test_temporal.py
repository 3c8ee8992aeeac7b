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


def test_sessionize_capped_hand_sequence(spark):
    """gap=10s, cap=25s over ts [0,5,12,20,26,50]: 26 breaks on the
    DURATION cap (gap only 6), 50 breaks on the gap → 3 sessions."""
    from flight_radar_pipeline_spark.operators.temporal import (
        sessionize_capped,
    )

    rows = [(1, t) for t in [0, 5, 12, 20, 26, 50]]
    df = spark.createDataFrame(rows, "u long, t long").select(
        "u", F.col("t").cast("timestamp").alias("ts")
    )
    r = sessionize_capped(df, "u", "ts", 10, 25).collect()[0]
    assert (r.n_sessions, r.n_gap_breaks, r.n_cap_breaks) == (3, 1, 1)
    assert r.n_events == 6


def test_sessionize_capped_uncapped_equals_lag_cumsum(spark):
    """With the cap effectively infinite, per-user session counts must
    equal the classic lag+cumsum formulation on real data."""
    from flight_radar_pipeline_spark.operators.temporal import (
        sessionize_capped,
    )
    from flight_radar_pipeline_spark.sources.readers import load_table
    from conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    got = {
        r.user: r.n_sessions
        for r in sessionize_capped(
            ev, "user_id", "ts", 1800, 10**12, max_events=100000
        ).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    want = (
        ev.select(
            "user_id",
            (
                F.coalesce(
                    (
                        F.col("ts").cast("long")
                        - F.lag(F.col("ts").cast("long")).over(w)
                    )
                    > 1800,
                    F.lit(True),
                )
            )
            .cast("long")
            .alias("brk"),
        )
        .groupBy("user_id")
        .agg(F.sum("brk").alias("ns"))
        .collect()
    )
    for r in want:
        assert got[r.user_id] == r.ns, r.user_id
