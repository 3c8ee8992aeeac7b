"""Q1–Q6 against the DuckDB oracle + partition-count determinism
(SURVEY.md §5 tiers 2 and 3)."""

from __future__ import annotations

import pytest

from flight_radar_pipeline_spark.plans import queries as Q
from oracle import compare

ORACLES = {
    "airline_with_most_flights": """
        select airline_name, count(*) as flight_count
        from flights_gold
        group by 1
        order by flight_count desc, airline_name
        limit 1
    """,
    "most_active_airline_per_continent": """
        with c as (
            select origin_continent as continent, airline_name,
                   count(*) as flight_count
            from flights_gold
            where origin_continent = destination_continent
            group by 1, 2
        ), r as (
            select *, row_number() over (
                partition by continent
                order by flight_count desc, airline_name
            ) as rn from c
        )
        select continent, airline_name, flight_count from r where rn = 1
    """,
    "longest_trajectory_flight": """
        select * from flights_gold order by distance desc, id limit 1
    """,
    "average_flight_length_per_continent": """
        select origin_continent as continent,
               round(avg(distance), 2) as average_distance
        from flights_gold
        where origin_continent = destination_continent
        group by 1
    """,
    "top_three_aircraft_models_per_country": """
        with c as (
            select origin_country, aircraft_code, count(*) as cnt
            from flights_gold group by 1, 2
        ), r as (
            select *, row_number() over (
                partition by origin_country
                order by cnt desc, aircraft_code
            ) as rank from c
        )
        select origin_country,
               string_agg(aircraft_code, ', ' order by rank) as top_aircrafts
        from r where rank <= 3 group by 1
    """,
    "airport_with_most_diff_in_out_flights": """
        with o as (
            select origin_airport_name as airport, count(*) as outgoing_count
            from flights_gold group by 1
        ), i as (
            select destination_airport_name as airport, count(*) as incoming_count
            from flights_gold group by 1
        )
        select o.airport, outgoing_count, incoming_count,
               abs(outgoing_count - incoming_count) as diff
        from o join i using (airport)
        order by diff desc, airport
        limit 1
    """,
}


@pytest.mark.parametrize("name", list(Q.QUERIES))
def test_query_matches_oracle(name, gold, duck):
    assert name in ORACLES, f"no oracle for {name}"
    rtol = 1e-9 if name == "average_flight_length_per_continent" else 0.0
    compare(Q.QUERIES[name](gold), ORACLES[name], duck, float_rtol=rtol)


@pytest.mark.parametrize("name", ["most_active_airline_per_continent",
                                  "top_three_aircraft_models_per_country",
                                  "airport_with_most_diff_in_out_flights"])
def test_query_partition_determinism(name, spark, gold):
    """Tier 3: identical output under different shuffle partitioning —
    flushes out order-dependent semantics the reference had (A5/A7)."""
    fn = Q.QUERIES[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(map(tuple, fn(gold).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        many = sorted(map(tuple, fn(gold.repartition(16)).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == many
