"""The flightradar Python DataSource: reader syntax, partition planning,
grid invariance, cap-triggered quartering, schema enforcement."""

from __future__ import annotations

import pyspark.sql.functions as F

from flight_radar_pipeline_spark import schemas
from flight_radar_pipeline_spark.sources.flight_datasource import (
    FlightRadarDataSource,
    synthetic_client,
)


def _read(spark, **opts):
    spark.dataSource.register(FlightRadarDataSource)
    r = spark.read.format("flightradar")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_reads_all_flights_with_explicit_schema(spark):
    df = _read(spark)
    assert df.schema == schemas.FLIGHTS_RAW
    assert df.count() == 200  # synthetic default corpus, exactly once each
    assert df.select("id").distinct().count() == 200


def test_grid_choice_changes_partitioning_not_results(spark):
    one = sorted(r.id for r in _read(spark, grid="1x1").select("id").collect())
    wide = sorted(
        r.id for r in _read(spark, grid="4x4").select("id").collect()
    )
    assert one == wide
    assert _read(spark, grid="4x4").rdd.getNumPartitions() == 16


def test_cap_triggers_quartering_without_row_loss(spark):
    # cap far below the corpus: every zone truncates until quartering
    # isolates small-enough cells; rows must still arrive exactly once
    df = _read(spark, limit=25, grid="2x2", max_depth=10)
    assert df.count() == 200
    assert df.select("id").distinct().count() == 200


def test_synthetic_client_is_deterministic():
    a = synthetic_client()((__import__(
        "flight_radar_pipeline_spark.sources.flight_api", fromlist=["WORLD"]
    )).WORLD)
    b = synthetic_client()((__import__(
        "flight_radar_pipeline_spark.sources.flight_api", fromlist=["WORLD"]
    )).WORLD)
    assert a == b and len(a) == 200


def test_source_composes_with_engine_plans(spark):
    df = _read(spark, grid="2x2")
    agg = (
        df.groupBy("airline_icao")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "airline_icao")
    )
    rows = agg.collect()
    assert sum(r.n for r in rows) == 200


def test_stream_reader_polls_snapshots_exactly_once(spark):
    spark.dataSource.register(FlightRadarDataSource)
    import uuid

    name = f"fds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("flightradar")
        .option("max_snapshots", "3")
        .option("grid", "2x2")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(name)
    assert out.count() == 600  # 3 snapshots x 200 flights
    # same flight appears once per snapshot with the time bumped
    per_flight = (
        out.groupBy("id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_flight] == [3]
    times = sorted(
        r.time for r in out.filter(F.col("id") == "f000000").collect()
    )
    assert times[1] - times[0] == 60 and times[2] - times[1] == 60
