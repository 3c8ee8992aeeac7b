"""The reference's six analytics queries (SURVEY.md §2.9) as pure functions
of a gold-shaped DataFrame.

Shape kept from the reference's one good architectural idea
(``/root/reference/tests/test_answers.py``: queries take a DataFrame, not a
path) — but every function returns a *DataFrame* (driver collects at the
edge), and each order-dependent construct is rewritten deterministically:

- Q2's ``orderBy(...).groupBy().agg(F.first(...))``
  (``/root/reference/src/answers.py:45-49``) relies on ordering surviving a
  shuffle into the aggregate — undefined in Spark, happens to pass on one
  partition. Rewritten as a window argmax (``row_number() == 1``).
- Q5's ``collect_list`` order (``/root/reference/src/answers.py:102-103``)
  is arrival order — rewritten as sort of (rank, code) structs.
- every top-1 (`orderBy().first()`, ``src/answers.py:23,64,128``) gets an
  explicit tiebreak so ties don't flap across partition counts. The
  planner executes these as ``TakeOrderedAndProject`` (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def airline_with_most_flights(gold: DataFrame) -> DataFrame:
    """Q1 (``/root/reference/src/answers.py:10-25``): argmax airline by
    flight count → (airline_name, flight_count)."""
    return (
        gold.groupBy("airline_name")
        .agg(F.count(F.lit(1)).alias("flight_count"))
        .orderBy(F.desc("flight_count"), F.asc("airline_name"))
        .limit(1)
    )


def most_active_airline_per_continent(gold: DataFrame) -> DataFrame:
    """Q2 (``/root/reference/src/answers.py:28-51``): among intra-continent
    flights, per-continent argmax airline → (continent, airline_name,
    flight_count)."""
    counts = (
        gold.filter(F.col("origin_continent") == F.col("destination_continent"))
        .groupBy("origin_continent", "airline_name")
        .agg(F.count(F.lit(1)).alias("flight_count"))
    )
    w = Window.partitionBy("origin_continent").orderBy(
        F.desc("flight_count"), F.asc("airline_name")
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("origin_continent", "continent")
        .orderBy("continent")
    )


def longest_trajectory_flight(gold: DataFrame) -> DataFrame:
    """Q3 (``/root/reference/src/answers.py:54-66``): global argmax by
    distance → the full gold row."""
    return gold.orderBy(F.desc("distance"), F.asc("id")).limit(1)


def average_flight_length_per_continent(gold: DataFrame) -> DataFrame:
    """Q4 (``/root/reference/src/answers.py:69-84``): intra-continent
    flights, avg distance per continent rounded to 2dp (the reference
    rounds driver-side; we round in-plan) → (continent, average_distance)."""
    return (
        gold.filter(F.col("origin_continent") == F.col("destination_continent"))
        .groupBy(F.col("origin_continent").alias("continent"))
        .agg(F.round(F.avg("distance"), 2).alias("average_distance"))
        .orderBy("continent")
    )


def top_three_aircraft_models_per_country(gold: DataFrame) -> DataFrame:
    """Q5 (``/root/reference/src/answers.py:87-106``): per origin country,
    top-3 aircraft codes by count, comma-joined in rank order →
    (origin_country, top_aircrafts)."""
    counts = gold.groupBy("origin_country", "aircraft_code").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("origin_country").orderBy(
        F.desc("cnt"), F.asc("aircraft_code")
    )
    ranked = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 3
    )
    # deterministic rank-ordered join: sort (rank, code) structs, then join
    # codes — replaces the reference's arrival-order collect_list (A7).
    return (
        ranked.groupBy("origin_country")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "aircraft_code"))),
                    lambda s: s["aircraft_code"],
                ),
                ", ",
            ).alias("top_aircrafts")
        )
        .orderBy("origin_country")
    )


def airport_with_most_diff_in_out_flights(gold: DataFrame) -> DataFrame:
    """Q6 (``/root/reference/src/answers.py:110-130``): per airport
    |outgoing − incoming| via join of the two degree counts, global argmax
    → (airport, outgoing_count, incoming_count, diff).

    Inner join preserved from the reference: airports with only departures
    or only arrivals are dropped (SURVEY.md §2.4 J4).
    """
    outgoing = gold.groupBy(
        F.col("origin_airport_name").alias("airport")
    ).agg(F.count(F.lit(1)).alias("outgoing_count"))
    incoming = gold.groupBy(
        F.col("destination_airport_name").alias("airport")
    ).agg(F.count(F.lit(1)).alias("incoming_count"))
    return (
        outgoing.join(incoming, "airport", "inner")
        .withColumn("diff", F.abs(F.col("outgoing_count") - F.col("incoming_count")))
        .orderBy(F.desc("diff"), F.asc("airport"))
        .limit(1)
    )


QUERIES = {
    "airline_with_most_flights": airline_with_most_flights,
    "most_active_airline_per_continent": most_active_airline_per_continent,
    "longest_trajectory_flight": longest_trajectory_flight,
    "average_flight_length_per_continent": average_flight_length_per_continent,
    "top_three_aircraft_models_per_country": top_three_aircraft_models_per_country,
    "airport_with_most_diff_in_out_flights": airport_with_most_diff_in_out_flights,
}
