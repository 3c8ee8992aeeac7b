"""Flight-API source adapters (SURVEY.md §2.1 S1-S5).

The reference pulls live flights driver-side from the FlightRadar24 client,
recursively quartering any zone that hits the API's row cap
(`/root/reference/src/extract.py:11-83`). This module keeps that *client
pagination* logic but engine-shaped:

- the network client is injected as a plain ``fetch_zone(zone) -> rows``
  callable, so tests (and offline runs) swap in fixture-backed fakes — no
  network dependency anywhere in the engine;
- the cap comparison is done on ints. The reference reads ``API_LIMIT``
  from INI as a *string* and compares it to ``len(flights)`` — in Python 3
  ``int == str`` is always False, so its recursive split can never fire
  (`/root/reference/src/extract.py:7-8,63`; latent bug documented in
  SURVEY.md §2.1 S1). Not reproduced.
- rows land in Spark through ``spark.createDataFrame`` with an explicit
  schema (no inference — SURVEY §1.3);
- at scale the zone grid is distributed: ``fetch_all_distributed`` ships
  the same per-zone recursion to executors via ``parallelize(zones)
  .flatMap``, so N initial zones fetch concurrently instead of serially
  on the driver. The callable must be picklable and the API must tolerate
  executor-side fan-out (rate limits are the real bound, not the engine).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Zone:
    """Lat/lon bounding box: tl = (north, west), br = (south, east)."""

    north: float
    west: float
    south: float
    east: float

    def quarter(self) -> list["Zone"]:
        """Split into 4 equal sub-zones (reference ``divide_zone``,
        `/root/reference/src/extract.py:11-51`)."""
        mid_lat = (self.north + self.south) / 2
        mid_lon = (self.west + self.east) / 2
        return [
            Zone(self.north, self.west, mid_lat, mid_lon),
            Zone(self.north, mid_lon, mid_lat, self.east),
            Zone(mid_lat, self.west, self.south, mid_lon),
            Zone(mid_lat, mid_lon, self.south, self.east),
        ]


WORLD = Zone(north=90.0, west=-180.0, south=-90.0, east=180.0)

FetchZone = Callable[[Zone], list]


def fetch_zone_recursive(
    fetch_zone: FetchZone,
    zone: Zone,
    limit: int,
    max_depth: int = 8,
) -> Iterator:
    """Yield every row in ``zone``, quartering whenever a fetch returns
    ``>= limit`` rows (the cap means "truncated — ask smaller").

    ``max_depth`` bounds recursion against degenerate hotspots (the
    reference recurses unboundedly); at depth 0 the truncated page is
    yielded as-is rather than lost.
    """
    rows = fetch_zone(zone)
    if len(rows) >= int(limit) and max_depth > 0:
        for sub in zone.quarter():
            yield from fetch_zone_recursive(fetch_zone, sub, limit, max_depth - 1)
    else:
        yield from rows


def fetch_all(
    fetch_zone: FetchZone,
    limit: int,
    zones: Iterable[Zone] = (WORLD,),
    max_depth: int = 8,
) -> list:
    """Driver-side fetch over an initial zone grid (S1 equivalent)."""
    out: list = []
    for z in zones:
        out.extend(fetch_zone_recursive(fetch_zone, z, limit, max_depth))
    return out


def fetch_all_distributed(
    spark: SparkSession,
    fetch_zone: FetchZone,
    limit: int,
    zones: list[Zone],
    schema: StructType,
    max_depth: int = 8,
) -> DataFrame:
    """Executor-side fetch: the zone grid is parallelized and each task
    runs the same quartering recursion, so ingest scales with the grid
    instead of serializing on the driver. Returns a DataFrame with the
    explicit ``schema`` (rows must be dicts matching its field names)."""
    n = max(len(zones), 1)
    rows = spark.sparkContext.parallelize(zones, n).flatMap(
        lambda z: list(fetch_zone_recursive(fetch_zone, z, limit, max_depth))
    )
    return spark.createDataFrame(rows, schema=schema)


def rows_to_df(spark: SparkSession, rows: list, schema: StructType) -> DataFrame:
    """In-memory rows → DataFrame with explicit schema (S4/S5; the
    reference's inferred bronze ``createDataFrame`` is not reproduced)."""
    return spark.createDataFrame(rows, schema=schema)
