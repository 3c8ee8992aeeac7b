"""Silver → gold: dimension enrichment + distance, one broadcast-join pipeline.

Reference build (``/root/reference/src/transform.py:197-264``): three
sequential equi inner joins (airports×2 on origin/destination IATA, airlines
on ICAO) plus a haversine UDF column. Inner-join semantics silently drop
flights whose codes miss the dimensions — preserved here for parity, with a
``how=`` knob (SURVEY.md §2.4).

Scale posture: both dimensions are small (≈5k airports, ≈1.5k airlines), so
each join carries an explicit ``F.broadcast`` hint — the fact table is never
shuffled, and with the UDFs replaced by native expressions the whole gold
build is a single WholeStageCodegen pipeline over the fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.geo import haversine_km_f32


def _prefixed_airport(airports: DataFrame, prefix: str) -> DataFrame:
    """Project the airport dimension to the gold column set for one side.

    Mirrors the reference's select-with-alias-and-cast
    (``src/transform.py:214-221,226-237``); the float casts also repair the
    reference's CSV-roundtrip type erasure (SURVEY.md §1.2) and are no-ops
    on a properly typed dimension.
    """
    return airports.select(
        F.col("iata").alias(f"__{prefix}_iata"),
        F.col("name").alias(f"{prefix}_airport_name"),
        F.col("latitude").cast("float").alias(f"{prefix}_latitude"),
        F.col("longitude").cast("float").alias(f"{prefix}_longitude"),
        F.col("continent").alias(f"{prefix}_continent"),
        F.col("country").alias(f"{prefix}_country"),
    )


def build_gold(
    flights_silver: DataFrame,
    airports: DataFrame,
    airlines: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Produce the 22-column gold fact table (``schemas.FLIGHTS_GOLD``)."""
    origin = _prefixed_airport(airports, "origin")
    dest = _prefixed_airport(airports, "destination")
    airline_dim = airlines.select(
        F.col("ICAO").alias("__airline_icao"),
        F.col("Name").alias("airline_name"),
    )

    gold = (
        flights_silver.join(
            F.broadcast(origin),
            flights_silver["origin_airport_iata"] == F.col("__origin_iata"),
            how,
        )
        .join(
            F.broadcast(dest),
            flights_silver["destination_airport_iata"] == F.col("__destination_iata"),
            how,
        )
        .join(
            F.broadcast(airline_dim),
            flights_silver["airline_icao"] == F.col("__airline_icao"),
            how,
        )
        .drop("__origin_iata", "__destination_iata", "__airline_icao")
    )

    # double-precision haversine cast to float32 at the layer boundary —
    # the documented parity requirement (SURVEY.md §1.2; FIXTURES.md §4).
    return gold.withColumn(
        "distance",
        haversine_km_f32(
            "origin_latitude", "origin_longitude",
            "destination_latitude", "destination_longitude",
        ),
    )
