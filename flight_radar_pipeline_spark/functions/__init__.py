"""Column-expression function library (no row-at-a-time Python UDFs).

Replaces the reference's two scalar Python UDFs (SURVEY.md §2.7):
``get_distance`` → :func:`geo.haversine_km` (pure Column expr, codegen'd);
``get_continent`` → :mod:`continents` (broadcast-joined static lookup).
"""

from flight_radar_pipeline_spark.functions.geo import haversine_km, haversine_km_f32
from flight_radar_pipeline_spark.functions.continents import (
    COUNTRY_TO_CONTINENT,
    continent_lookup_df,
    with_continent,
)

__all__ = [
    "haversine_km",
    "haversine_km_f32",
    "COUNTRY_TO_CONTINENT",
    "continent_lookup_df",
    "with_continent",
]
