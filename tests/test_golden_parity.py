"""Golden-fixture parity against the reference's OWN published test values.

Reads the reference's 1,000-row gold fixture (`/root/reference/tests/test.parquet`)
and asserts the exact expected values from `/root/reference/tests/test_answers.py:22-77`
— the strongest reference-parity claim available, including the bit-exact
float32 distance `15340.56640625` (proves the float32 cast discipline in
`functions/geo.py`).

Where the reference's published value is NOT well-defined — its Q2 uses
`orderBy().groupBy().agg(first())` (order undefined through a shuffle,
`/root/reference/src/answers.py:45-49`) and its Q5 rank window breaks count
ties arbitrarily (`src/answers.py:99`) — we assert *tie-equivalence*: our
deterministic answer and the published one differ only among entries whose
counts are exactly equal, verified against an independent DuckDB count
oracle. The deterministic choices themselves are locked so they can never
drift between releases.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from flight_radar_pipeline_spark.plans.queries import QUERIES

FIXTURE = "/root/reference/tests/test.parquet"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference golden fixture not present"
)


@pytest.fixture(scope="module")
def ref_gold(spark):
    return spark.read.parquet(FIXTURE)


@pytest.fixture(scope="module")
def ref_duck():
    con = duckdb.connect()
    con.sql(f"create view g as select * from parquet_scan('{FIXTURE}')")
    return con


# ---- exact published values (reference/tests/test_answers.py) ----------------


def test_q1_airline_with_most_flights(ref_gold):
    r = QUERIES["airline_with_most_flights"](ref_gold).collect()[0]
    assert r.airline_name == "United Airlines"
    assert r.flight_count == 81


def test_q3_longest_trajectory_bit_exact(ref_gold):
    r = QUERIES["longest_trajectory_flight"](ref_gold).collect()[0]
    assert r.id == "34d26b57"
    assert r.aircraft_code == "A359"
    assert r.origin_airport_iata == "SIN"
    assert r.destination_airport_iata == "JFK"
    assert r.number == "SQ24"
    # bit-exact float32: proves distance is computed in double then cast to
    # float exactly once, like the reference's schema
    assert r.distance == 15340.56640625


def test_q4_average_flight_length_per_continent(ref_gold):
    got = {
        r.continent: r.average_distance
        for r in QUERIES["average_flight_length_per_continent"](ref_gold).collect()
    }
    assert got == {
        "Europe": 3754.54,
        "Africa": 4011.91,
        "North America": 3745.53,
        "South America": 4386.82,
        "Oceania": 4332.03,
        "Asia": 4750.06,
    }


def test_q6_result_lock(ref_gold):
    """The reference never tested Q6; lock our deterministic answer on the
    golden fixture so it cannot drift."""
    r = QUERIES["airport_with_most_diff_in_out_flights"](ref_gold).collect()[0]
    assert (r.airport, r.outgoing_count, r.incoming_count, r.diff) == (
        "Frankfurt Airport",
        44,
        5,
        39,
    )


# ---- tie-equivalence where the reference's published order is arbitrary ------

REF_Q2 = {
    "Africa": "Ethiopian Airlines",
    "Asia": "Turkish Airlines",
    "Europe": "Norwegian",
    "North America": "American Airlines",
    "Oceania": "Nauru Airlines",
    "South America": "Avianca",
}
# deterministic lock: ours breaks count ties by airline name ascending
OUR_Q2 = {**REF_Q2, "Europe": "Aeroflot"}


def test_q2_most_active_airline_per_continent(ref_gold, ref_duck):
    got = {
        r.continent: r.airline_name
        for r in QUERIES["most_active_airline_per_continent"](ref_gold).collect()
    }
    assert got == OUR_Q2
    # wherever we diverge from the published value, both airlines must hold
    # the same (maximal) flight count — i.e. the reference froze a tie
    for cont in REF_Q2:
        if got[cont] == REF_Q2[cont]:
            continue
        counts = dict(
            ref_duck.sql(
                f"""select airline_name, count(*) from g
                    where origin_continent = '{cont}'
                      and origin_continent = destination_continent
                    group by 1"""
            ).fetchall()
        )
        assert counts[got[cont]] == counts[REF_Q2[cont]] == max(counts.values())


REF_Q5 = {
    "Morocco": "B78X",
    "United States": "A321, B77W, B77L",
    "Singapore": "A359, B77W, A388",
    "Norway": "B738, B77L, A333",
    "Brazil": "B77L, B748, A359",
    "Australia": "B789, A333, A359",
    "Turkey": "B789, A359, B77W",
}
# deterministic lock: ours breaks count ties by aircraft code ascending
OUR_Q5 = {
    **REF_Q5,
    "Singapore": "A359, A388, B77W",
    "Norway": "A333, B738, B77L",
    "Brazil": "B77L, A359, B748",
    "Turkey": "A359, B789, B38M",
}


def test_q5_top_three_aircraft_models(ref_gold, ref_duck):
    got = {
        r.origin_country: r.top_aircrafts
        for r in QUERIES["top_three_aircraft_models_per_country"](ref_gold).collect()
    }
    for country, ours in OUR_Q5.items():
        assert got[country] == ours, country
        if ours == REF_Q5[country]:
            continue
        counts = dict(
            ref_duck.sql(
                f"""select aircraft_code, count(*) from g
                    where origin_country = '{country}' group by 1"""
            ).fetchall()
        )
        our_codes = ours.split(", ")
        ref_codes = REF_Q5[country].split(", ")
        our_counts = [counts[c] for c in our_codes]
        ref_counts = [counts[c] for c in ref_codes]
        # same non-increasing count profile → both are valid top-3 orderings
        assert our_counts == ref_counts, country
        assert our_counts == sorted(our_counts, reverse=True), country
        # membership may differ only among codes tied at the cutoff count
        cutoff = our_counts[-1]
        for c in set(our_codes) ^ set(ref_codes):
            assert counts[c] == cutoff, (country, c)
