"""Query layer: DataFrame-in / DataFrame-out analytics plans."""

from flight_radar_pipeline_spark.plans.queries import (
    QUERIES,
    airline_with_most_flights,
    airport_with_most_diff_in_out_flights,
    average_flight_length_per_continent,
    longest_trajectory_flight,
    most_active_airline_per_continent,
    top_three_aircraft_models_per_country,
)

__all__ = [
    "QUERIES",
    "airline_with_most_flights",
    "most_active_airline_per_continent",
    "longest_trajectory_flight",
    "average_flight_length_per_continent",
    "top_three_aircraft_models_per_country",
    "airport_with_most_diff_in_out_flights",
]
