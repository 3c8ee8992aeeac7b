"""Property tier (SURVEY.md §5.4): native exprs vs independent Python math."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.geo import haversine_km, haversine_km_f32
from flight_radar_pipeline_spark.functions.continents import (
    COUNTRY_TO_CONTINENT,
    with_continent,
)


def _py_haversine(lat1, lon1, lat2, lon2, r=6371.0):
    """Independent reimplementation of the published haversine formula
    (same math as /root/reference/src/transform.py:57-87)."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine_matches_python(spark):
    rng = np.random.default_rng(11)
    rows = [
        (float(a), float(b), float(c), float(d))
        for a, b, c, d in zip(
            rng.uniform(-90, 90, 300),
            rng.uniform(-180, 180, 300),
            rng.uniform(-90, 90, 300),
            rng.uniform(-180, 180, 300),
        )
    ]
    df = spark.createDataFrame(rows, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        "*", haversine_km("lat1", "lon1", "lat2", "lon2").alias("d")
    ).collect()
    for r in got:
        want = _py_haversine(r.lat1, r.lon1, r.lat2, r.lon2)
        assert r.d == pytest.approx(want, rel=1e-12)


def test_haversine_known_value(spark):
    # Paris CDG → New York JFK ≈ 5834 km (published great-circle distance)
    df = spark.createDataFrame(
        [(49.0097, 2.5479, 40.6413, -73.7781)], "a double, b double, c double, d double"
    )
    d = df.select(haversine_km("a", "b", "c", "d").alias("d")).first().d
    assert d == pytest.approx(5834, abs=10)


def test_haversine_null_propagation_and_f32(spark):
    df = spark.createDataFrame(
        [(None, 2.0, 3.0, 4.0), (1.0, 2.0, 3.0, 4.0)],
        "a double, b double, c double, d double",
    )
    out = df.select(haversine_km_f32("a", "b", "c", "d").alias("d")).collect()
    assert out[0].d is None
    assert isinstance(out[1].d, float)
    assert out[1].d == np.float32(_py_haversine(1.0, 2.0, 3.0, 4.0))  # f32 cast parity


def test_continent_lookup(spark):
    df = spark.createDataFrame(
        [("France",), ("Singapore",), ("Atlantis",), (None,)], "country string"
    )
    got = {
        r.country: r.continent
        for r in with_continent(df, "country").collect()
    }
    assert got["France"] == "Europe"
    assert got["Singapore"] == "Asia"
    assert got["Atlantis"] == "Unknown"
    assert got[None] == "Unknown"


def test_lookup_covers_all_continents():
    assert set(COUNTRY_TO_CONTINENT.values()) == {
        "Africa", "Antarctica", "Asia", "Europe",
        "North America", "Oceania", "South America",
    }
