"""Analytics CLI over a gold snapshot (SURVEY.md §3.2).

Mirrors the reference's Typer commands (`/root/reference/src/answers.py:
134-174`) with stdlib argparse (no extra deps). Differences by design:

- queries come from the registry (``plans.queries.QUERIES``) and take an
  explicit DataFrame — no module-global bound at import time
  (`/root/reference/src/answers.py:207`);
- the snapshot is resolved by partition-value pruning
  (``sinks.latest_snapshot``) when ``--latest`` is given, instead of
  driver-side object listing + lexicographic sort
  (`/root/reference/src/answers.py:196-203`);
- results print as JSON rows — machine-consumable, deterministic order.

Usage::

    python -m flight_radar_pipeline_spark.cli airline-with-most-flights \
        --gold /path/to/gold.parquet
"""

from __future__ import annotations

import argparse
import json
import sys

from flight_radar_pipeline_spark.plans.queries import QUERIES
from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark.sinks import latest_snapshot

# CLI command name (reference spelling) → registry key
COMMANDS = {
    "airline-with-most-flights": "airline_with_most_flights",
    "most-active-airline-per-continent": "most_active_airline_per_continent",
    "longest-trajectory-flight": "longest_trajectory_flight",
    "average-flight-length-per-continent": "average_flight_length_per_continent",
    "top-three-aircraft-model-per-country": "top_three_aircraft_models_per_country",
    "airport-with-most-diff-in-out-flight": "airport_with_most_diff_in_out_flights",
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="flight-analytics", description=__doc__.splitlines()[0]
    )
    parser.add_argument("command", choices=sorted(COMMANDS))
    parser.add_argument("--gold", required=True, help="gold parquet path")
    parser.add_argument(
        "--latest",
        action="store_true",
        help="treat --gold as a date-partitioned table and read only the "
        "most recent (year, month, day) partition",
    )
    parser.add_argument("--master", default="local[*]")
    args = parser.parse_args(argv)

    spark = get_spark_session(app_name="flight-analytics-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        gold = (
            latest_snapshot(spark, args.gold)
            if args.latest
            else spark.read.parquet(args.gold)
        )
        result = QUERIES[COMMANDS[args.command]](gold)
        for row in result.collect():
            print(json.dumps(row.asDict(), default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
