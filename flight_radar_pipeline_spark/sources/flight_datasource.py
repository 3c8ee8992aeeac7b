"""Flight scan as a Spark Python DataSource (``spark.read.format(...)``).

The reference pulls flights driver-side in a plain script
(`/root/reference/src/extract.py:53-83`); ``fetch_all_distributed``
already ships that zone-quartered pagination to executors. This module
goes one step further and registers the scan as a first-class source
through Spark 4's Python DataSource V2 API, so ingest is ordinary reader
syntax and the ENGINE owns partition planning:

    spark.dataSource.register(FlightRadarDataSource)
    df = (spark.read.format("flightradar")
          .option("client", "my_pkg.clients:make_client")
          .option("limit", "1500").option("grid", "4x4").load())

- Each initial grid zone is one ``InputPartition`` → Spark schedules the
  per-zone quartering recursion (``fetch_zone_recursive``, cap semantics
  identical to the library path) as a separate task; a hot zone quarters
  inside its own task without blocking the rest of the grid.
- The network client is injected as an importable ``module:function``
  factory returning a ``FetchZone`` callable (options are strings in
  this API), keeping the no-network-in-tests rule; the built-in
  ``synthetic_client`` factory is the deterministic md5-seeded default.
- Schema is the explicit ``schemas.FLIGHTS_RAW`` — never inferred.

Scale posture: partition count = grid size (the parallelism knob); row
production is executor-side generator output, so nothing accumulates on
the driver; rate limiting, not the engine, bounds real-API fan-out.
"""

from __future__ import annotations

import hashlib
import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from flight_radar_pipeline_spark import schemas
from flight_radar_pipeline_spark.sources.flight_api import (
    FetchZone,
    Zone,
    fetch_zone_recursive,
)


def _grid(spec: str) -> list[Zone]:
    """'RxC' → R×C equal world zones (row-major)."""
    rows, cols = (int(p) for p in spec.lower().split("x"))
    zones = []
    for r in range(rows):
        for c in range(cols):
            north = 90.0 - 180.0 * r / rows
            south = 90.0 - 180.0 * (r + 1) / rows
            west = -180.0 + 360.0 * c / cols
            east = -180.0 + 360.0 * (c + 1) / cols
            zones.append(Zone(north, west, south, east))
    return zones


def _u(key: str) -> float:
    """Deterministic uniform in [0, 1) from md5 — partition/run stable."""
    return int(hashlib.md5(key.encode()).hexdigest()[:12], 16) / 16**12


def synthetic_client(n_flights: int = 200, seed: str = "fds") -> FetchZone:
    """Deterministic offline stand-in for the network client: ``n_flights``
    md5-placed flights worldwide; a zone fetch returns exactly the ones
    inside it, mimicking the bounding-box API. Same rows for any grid or
    partitioning — what makes the DataSource testable bit-for-bit."""
    flights = []
    for i in range(n_flights):
        lat = -90.0 + 180.0 * _u(f"{seed}-lat-{i}")
        lon = -180.0 + 360.0 * _u(f"{seed}-lon-{i}")
        flights.append(
            (
                f"f{i:06d}",
                f"A{int(_u(f'{seed}-ac-{i}') * 999):03d}",
                1_700_000_000 + i,
                float(round(lat, 5)),
                float(round(lon, 5)),
                f"O{i % 97:02d}",
                f"D{i % 89:02d}",
                f"FL{i:05d}",
                i % 2,
                f"C{i % 53:02d}",
            )
        )

    def fetch(zone: Zone) -> list:
        # half-open membership (closed only at the world's north/east rim)
        # so grid cells and quarters tile exactly — no flight belongs to
        # two zones, which keeps any grid's union identical
        def inside(f) -> bool:
            lat_ok = zone.south <= f[3] < zone.north or (
                zone.north == 90.0 and f[3] == 90.0
            )
            lon_ok = zone.west <= f[4] < zone.east or (
                zone.east == 180.0 and f[4] == 180.0
            )
            return lat_ok and lon_ok

        return [f for f in flights if inside(f)]

    return fetch


def _resolve_client(spec: str) -> FetchZone:
    mod_name, _, fn_name = spec.partition(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    return fn()


class ZonePartition(InputPartition):
    def __init__(self, north: float, west: float, south: float, east: float):
        self.north, self.west, self.south, self.east = north, west, south, east


class FlightRadarReader(DataSourceReader):
    def __init__(self, options: dict):
        self.client_spec = options.get(
            "client",
            "flight_radar_pipeline_spark.sources.flight_datasource"
            ":synthetic_client",
        )
        self.limit = int(options.get("limit", "1500"))
        self.max_depth = int(options.get("max_depth", "8"))
        self.grid = options.get("grid", "2x2")

    def partitions(self) -> list[InputPartition]:
        return [
            ZonePartition(z.north, z.west, z.south, z.east)
            for z in _grid(self.grid)
        ]

    def read(self, partition: ZonePartition) -> Iterator[tuple]:
        fetch = _resolve_client(self.client_spec)
        zone = Zone(
            partition.north, partition.west, partition.south, partition.east
        )
        yield from fetch_zone_recursive(fetch, zone, self.limit, self.max_depth)


class FlightRadarDataSource(DataSource):
    """``format("flightradar")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "flightradar"

    def schema(self):
        return schemas.FLIGHTS_RAW

    def reader(self, schema) -> FlightRadarReader:
        return FlightRadarReader(self.options)

    def streamReader(self, schema) -> "FlightRadarStreamReader":
        return FlightRadarStreamReader(self.options)


class SnapshotPartition(InputPartition):
    def __init__(self, snapshot: int, north, west, south, east):
        self.snapshot = snapshot
        self.north, self.west, self.south, self.east = north, west, south, east


class FlightRadarStreamReader(DataSourceStreamReader):
    """Microbatch polling source: each offset step is one API snapshot of
    the whole grid (the reference polls hourly — here the poll counter IS
    the offset, so replay/retry re-reads the same snapshot
    deterministically: exactly-once by idempotent re-read). Offsets stop
    advancing at ``max_snapshots``, which is what lets availableNow runs
    terminate; a live deployment would instead advance with the clock.
    Partition planning is (snapshot × grid zone) — the batch reader's
    zone parallelism carried into every microbatch."""

    def __init__(self, options: dict):
        self._r = FlightRadarReader(options)
        self.max_snapshots = int(options.get("max_snapshots", "3"))

    def initialOffset(self) -> dict:
        return {"snapshot": 0}

    def latestOffset(self) -> dict:
        return {"snapshot": self.max_snapshots}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [
            SnapshotPartition(s, z.north, z.west, z.south, z.east)
            for s in range(start["snapshot"], end["snapshot"])
            for z in _grid(self._r.grid)
        ]

    def read(self, partition: SnapshotPartition) -> Iterator[tuple]:
        fetch = _resolve_client(self._r.client_spec)
        zone = Zone(
            partition.north, partition.west, partition.south, partition.east
        )
        for row in fetch_zone_recursive(
            fetch, zone, self._r.limit, self._r.max_depth
        ):
            # each snapshot advances the observation time by one minute —
            # deterministic per (snapshot, flight), so replays are exact
            yield (row[0], row[1], row[2] + 60 * partition.snapshot) + row[3:]

    def commit(self, end: dict) -> None:
        pass
