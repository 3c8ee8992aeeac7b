"""Flight-API source adapter: zone quartering, cap semantics, depth bound,
distributed fetch (SURVEY.md §2.1 S1-S5) — all against an injected fake
client, no network."""

from __future__ import annotations

from flight_radar_pipeline_spark.schemas import FLIGHTS_RAW
from flight_radar_pipeline_spark.sources.flight_api import (
    WORLD,
    Zone,
    fetch_all,
    fetch_all_distributed,
    fetch_zone_recursive,
)


def _grid_client(flights, cap):
    """Fake API: returns flights inside the zone, truncated at cap —
    exactly how a row-capped endpoint behaves."""

    def fetch(zone: Zone):
        hits = [
            f
            for f in flights
            if zone.south <= f["latitude"] < zone.north
            and zone.west <= f["longitude"] < zone.east
        ]
        return hits[:cap]

    return fetch


def _mk_flights(n, lat0, lon0, spread=1.0):
    return [
        {
            "id": f"f{lat0}-{lon0}-{i}",
            "latitude": lat0 + (i % 10) * spread / 10,
            "longitude": lon0 + (i // 10) * spread / 10,
        }
        for i in range(n)
    ]


def test_no_split_under_cap():
    flights = _mk_flights(5, 10.0, 10.0)
    got = list(fetch_zone_recursive(_grid_client(flights, cap=1500), WORLD, 1500))
    assert len(got) == 5


def test_quartering_recovers_all_rows_past_cap():
    # 40 flights clustered in one cell; cap 10 → the world fetch truncates,
    # quartering must recurse until every flight is visible
    flights = _mk_flights(40, 10.0, 10.0, spread=40.0)
    got = list(fetch_zone_recursive(_grid_client(flights, cap=10), WORLD, 10))
    assert sorted(f["id"] for f in got) == sorted(f["id"] for f in flights)


def test_cap_comparison_is_numeric():
    # the reference compares len(rows) to a *string* limit, so its split
    # never fires; ours must fire on int or numeric-string limits alike
    flights = _mk_flights(40, 10.0, 10.0, spread=40.0)
    got = list(fetch_zone_recursive(_grid_client(flights, cap=10), WORLD, "10"))
    assert len(got) == len(flights)


def test_depth_bound_yields_truncated_page():
    flights = _mk_flights(40, 10.0, 10.0, spread=0.0)  # all at one point
    got = list(
        fetch_zone_recursive(_grid_client(flights, cap=10), WORLD, 10, max_depth=3)
    )
    # degenerate hotspot: depth exhausts, the capped page is kept, not lost
    assert len(got) > 0


def test_fetch_all_over_grid():
    flights = _mk_flights(8, -20.0, 30.0)
    zones = WORLD.quarter()
    got = fetch_all(_grid_client(flights, cap=1500), 1500, zones)
    assert len(got) == 8


def test_distributed_fetch_matches_driver_fetch(spark):
    flights = [
        {
            "id": f["id"],
            "aircraft_code": "A320",
            "time": 1700000000,
            "latitude": f["latitude"],
            "longitude": f["longitude"],
            "origin_airport_iata": "AAA",
            "destination_airport_iata": "BBB",
            "number": "FL1",
            "on_ground": 0,
            "airline_icao": "AAL",
        }
        for f in _mk_flights(25, 5.0, 5.0, spread=30.0)
    ]
    client = _grid_client(flights, cap=8)
    df = fetch_all_distributed(
        spark, client, 8, WORLD.quarter(), schema=FLIGHTS_RAW
    )
    driver_rows = fetch_all(client, 8, WORLD.quarter())
    assert sorted(r["id"] for r in df.select("id").collect()) == sorted(
        f["id"] for f in driver_rows
    )
    assert df.schema == FLIGHTS_RAW
