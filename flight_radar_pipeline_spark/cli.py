"""CLI: the reference's analytics commands + the end-to-end pipeline run.

Mirrors the reference's Typer surface with stdlib argparse (no extra deps):
the six query commands (`/root/reference/src/answers.py:134-174`) and a
``run-pipeline`` subcommand equivalent to its Prefect ``pipeline_flow``
(`/root/reference/src/main.py:105-152`) — extract → bronze → silver → gold
→ partitioned write — driven from local files instead of a live API/object
store, so it runs offline. Differences by design:

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
    python -m flight_radar_pipeline_spark.cli run-pipeline \
        --base /data/frp --raw-flights /drops/flights.parquet \
        --airlines-csv airlines.csv --airports-csv airports.csv
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


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="flight-analytics", description=__doc__.splitlines()[0]
    )
    sub = parser.add_subparsers(dest="command", required=True)

    for name in sorted(COMMANDS):
        q = sub.add_parser(name, help=f"run the {COMMANDS[name]} query")
        q.add_argument("--gold", required=True, help="gold parquet path")
        q.add_argument(
            "--latest",
            action="store_true",
            help="treat --gold as a date-partitioned table and read only the "
            "most recent (year, month, day) partition",
        )
        q.add_argument("--master", default="local[*]")

    p = sub.add_parser(
        "run-pipeline",
        help="run the full medallion pipeline (bronze → silver → gold) from local files",
    )
    p.add_argument("--base", required=True, help="output base directory")
    p.add_argument(
        "--raw-flights",
        required=True,
        help="parquet path of raw flight rows (schemas.FLIGHTS_RAW)",
    )
    p.add_argument("--airlines-csv", help="airlines dimension CSV (schemas.AIRLINES)")
    p.add_argument(
        "--airports-csv",
        help="airports dimension CSV (schemas.AIRPORTS minus continent; "
        "continent is derived)",
    )
    p.add_argument("--master", default="local[*]")

    c = sub.add_parser(
        "corpus-prep",
        help="assemble a packed training corpus from a documents parquet "
        "(language/quality gates, exact+near dedup, optional "
        "decontamination, chunk, pack)",
    )
    c.add_argument("--docs", required=True, help="documents parquet path")
    c.add_argument("--out", required=True, help="output directory (packed parquet)")
    c.add_argument("--langs", help="comma-separated language allowlist")
    c.add_argument(
        "--eval-docs", help="held-out eval parquet for decontamination"
    )
    c.add_argument("--quality-threshold", type=float, default=0.5)
    c.add_argument("--token-budget", type=int, default=512)
    c.add_argument("--master", default="local[*]")

    sq = sub.add_parser(
        "sql",
        help="run an ANSI-SQL query over the testdata tables "
        "(region nation customer supplier part orders lineitem events "
        "documents embeddings registered as views)",
    )
    sq.add_argument("--sf-dir", required=True, help="testdata directory")
    sq.add_argument("--query", required=True, help="SQL text to execute")
    sq.add_argument("--limit", type=int, default=100)
    sq.add_argument("--master", default="local[*]")
    return parser


def _run_pipeline_cmd(spark, args) -> None:
    from flight_radar_pipeline_spark import schemas
    from flight_radar_pipeline_spark.functions.continents import with_continent
    from flight_radar_pipeline_spark.pipeline.runner import run_pipeline
    from flight_radar_pipeline_spark.sinks.writers import write_if_absent
    from flight_radar_pipeline_spark.sources.readers import read_csv, read_parquet

    # dims: seed from CSVs if given (idempotent — no-op when already landed)
    if args.airlines_csv:
        write_if_absent(
            read_csv(spark, args.airlines_csv, schemas.AIRLINES),
            f"{args.base}/dims/airlines",
        )
    if args.airports_csv:
        airports = read_csv(
            spark, args.airports_csv, schemas.StructType(schemas.AIRPORTS.fields[:-1])
        )
        write_if_absent(
            with_continent(airports, "country"), f"{args.base}/dims/airports"
        )

    raw = read_parquet(spark, args.raw_flights, schema=schemas.FLIGHTS_RAW)
    result = run_pipeline(spark, args.base, flights_raw=raw)
    print(
        json.dumps(
            {
                "gold_path": result.gold_path,
                "silver_path": result.silver_path,
                "bronze_path": result.bronze_path,
                "gold_rows": result.gold.count(),
            }
        )
    )


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    # getOrCreate reuses a live session (e.g. when main() is called from a
    # host application or notebook) — only stop what this entrypoint booted,
    # or the CLI would kill its caller's SparkContext on exit.
    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark_session(app_name="flight-analytics-cli", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.command == "run-pipeline":
            _run_pipeline_cmd(spark, args)
        elif args.command == "sql":
            from flight_radar_pipeline_spark.sources.readers import (
                register_views,
            )

            register_views(spark, args.sf_dir)
            for row in spark.sql(args.query).limit(args.limit).collect():
                print(json.dumps(row.asDict(), default=str))
        elif args.command == "corpus-prep":
            from flight_radar_pipeline_spark.pipeline.corpus import (
                run_corpus_prep,
            )

            res = run_corpus_prep(
                spark.read.parquet(args.docs),
                out_dir=args.out,
                quality_threshold=args.quality_threshold,
                langs=args.langs.split(",") if args.langs else None,
                eval_docs=(
                    spark.read.parquet(args.eval_docs)
                    if args.eval_docs
                    else None
                ),
                token_budget=args.token_budget,
            )
            print(json.dumps({"out": args.out, "metrics": res.metrics}))
        else:
            gold = (
                latest_snapshot(spark, args.gold)
                if args.latest
                else spark.read.parquet(args.gold)
            )
            result = QUERIES[COMMANDS[args.command]](gold)
            for row in result.collect():
                print(json.dumps(row.asDict(), default=str))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
