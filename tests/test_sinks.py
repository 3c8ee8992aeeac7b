"""Sinks: partitioned writer round-trip, snapshot pruning, dim-only CSV guard.

Covers SURVEY.md §2.2 K1-K3 and §2.1 S8: the reference's hand-built
``/year=Y/month=M/day=D/`` path strings (`/root/reference/src/load.py:20-81`)
and lexicographic latest-snapshot listing (`/root/reference/src/answers.py:196-203`)
become ``partitionBy`` columns + partition-value max.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.sinks import (
    latest_snapshot,
    write_partitioned,
    write_single_csv,
)


@pytest.fixture(scope="module")
def dated_df(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "a"),
        (2, "2024-01-01 11:00:00", "b"),
        (3, "2024-02-15 09:30:00", "c"),
        (4, "2024-03-20 23:59:59", "d"),
        (5, "2024-03-20 00:00:01", "e"),
    ]
    return spark.createDataFrame(rows, "id int, time string, payload string")


def test_write_partitioned_roundtrip(spark, dated_df, tmp_path):
    path = str(tmp_path / "part")
    write_partitioned(dated_df, path)
    back = spark.read.parquet(path)
    assert set(back.columns) == {"id", "time", "payload", "year", "month", "day"}
    assert back.count() == 5
    # partition columns really are directory-derived (pruning-eligible)
    assert back.filter((F.col("year") == 2024) & (F.col("month") == 2)).count() == 1


def test_latest_snapshot_prunes_to_max_day(spark, dated_df, tmp_path):
    path = str(tmp_path / "snap")
    write_partitioned(dated_df, path)
    latest = latest_snapshot(spark, path)
    got = sorted(r["id"] for r in latest.collect())
    assert got == [4, 5]  # only the 2024-03-20 partition
    plan = latest._jdf.queryExecution().executedPlan().toString()
    # the winning-partition filter reaches the scan as partition pruning
    assert "PartitionFilters" in plan


def test_write_single_csv_guards_large_input(spark, dated_df, tmp_path):
    path = str(tmp_path / "dim")
    write_single_csv(dated_df, path, max_rows=10)
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == 5
    with pytest.raises(ValueError, match="small dimensions"):
        write_single_csv(dated_df, str(tmp_path / "nope"), max_rows=3)


def test_write_if_absent_is_idempotent(spark, dated_df, tmp_path):
    from flight_radar_pipeline_spark.sinks import write_if_absent

    path = str(tmp_path / "dim_once")
    write_if_absent(dated_df, path)
    first = spark.read.parquet(path).count()
    # second write is a no-op (mode ignore), not an append or overwrite
    write_if_absent(dated_df.limit(1), path)
    assert spark.read.parquet(path).count() == first == 5
