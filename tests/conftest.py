"""Shared fixtures: one local SparkSession, the synthetic flight-domain
fixture materialized through the real pipeline, and a DuckDB connection with
the same tables registered for oracle comparison."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(__file__))  # tests/ as import root
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark import schemas
from flight_radar_pipeline_spark.functions.continents import with_continent
from flight_radar_pipeline_spark.pipeline import build_gold, build_silver

import flightgen

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    extra = {"spark.sql.warehouse.dir": "/tmp/frp-warehouse"}
    for kv in os.environ.get("FRP_TEST_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    # local[8] (was local[4]): measured round-14 — the heavy reference
    # tests (IRLS/brute-force comparisons) run −30% wall at 8 cores on
    # the 32-core harness hosts, and the driver's verify budget is the
    # binding gate (its round-13 run timed out at 88%). Result-identical
    # by construction (shuffle width stays pinned separately below);
    # override with FRP_TEST_MASTER / FRP_TEST_SHUFFLE / FRP_TEST_CONF.
    s = get_spark_session(
        app_name="frp-spark-tests",
        master=os.environ.get("FRP_TEST_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("FRP_TEST_SHUFFLE", "4")),
        timezone="UTC",
        extra_conf=extra,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def flight_tables(spark, tmp_path_factory):
    """Generate raw tables, run the real silver+gold pipeline, land parquet.

    Returns dict of name → parquet path; flight `time` parity needs the
    reference's pinned session TZ, so silver/gold are built under
    Europe/Paris regardless of the test-session default.
    """
    base = tmp_path_factory.mktemp("flight")
    pdfs = flightgen.generate()

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Paris")
    try:
        airlines = spark.createDataFrame(pdfs["airlines"], schema=schemas.AIRLINES)
        airports_nc = spark.createDataFrame(
            pdfs["airports"],
            schema=schemas.StructType(schemas.AIRPORTS.fields[:-1]),
        )
        airports = with_continent(airports_nc, "country")
        raw = spark.createDataFrame(pdfs["flights_raw"], schema=schemas.FLIGHTS_RAW)
        silver = build_silver(raw)
        gold = build_gold(silver, airports, airlines)

        paths = {}
        for name, df in [
            ("airlines", airlines),
            ("airports", airports),
            ("flights_silver", silver),
            ("flights_gold", gold),
        ]:
            p = str(base / name)
            df.coalesce(1).write.mode("overwrite").parquet(p)
            paths[name] = p
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return paths


@pytest.fixture(scope="session")
def gold(spark, flight_tables):
    return spark.read.parquet(flight_tables["flights_gold"])


@pytest.fixture(scope="session")
def duck(flight_tables):
    con = duckdb.connect()
    for name, path in flight_tables.items():
        con.sql(f"create view {name} as select * from parquet_scan('{path}/*.parquet')")
    for t in schemas.TESTDATA_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from parquet_scan('{p}')")
    return con
