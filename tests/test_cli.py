"""CLI smoke: every reference command runs against a gold snapshot and
prints JSON rows (SURVEY.md §3.2)."""

from __future__ import annotations

import json

import pytest

from flight_radar_pipeline_spark import cli


@pytest.mark.parametrize("command", sorted(cli.COMMANDS))
def test_cli_command(command, spark, flight_tables, capsys, monkeypatch):
    # reuse the test session instead of booting a second JVM; keep it alive
    monkeypatch.setattr(cli, "get_spark_session", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    rc = cli.main([command, "--gold", flight_tables["flights_gold"]])
    assert rc == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(out) >= 1 and isinstance(out[0], dict)


def test_sql_command_runs_over_registered_views(spark, capsys):
    # `spark` requested so a live session exists: pins the regression where
    # cli.main()'s finally-stop killed a caller's getOrCreate-shared session
    # (main must detect it does not own the active session and leave it up)
    import json as _json

    from flight_radar_pipeline_spark.cli import main

    rc = main(
        [
            "sql",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--query",
            "select count(*) as n from orders",
            "--master",
            "local[2]",
        ]
    )
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert _json.loads(out[-1]) == {"n": 1500}
    # the shared session must survive the CLI call
    assert spark.range(1).count() == 1


def test_sql_surface_expresses_reference_semantics(spark, flight_tables):
    """The SQL entry point states Q2 (most active airline per continent)
    in pure SQL over a registered gold view and matches the DataFrame
    plan row-for-row — the 'switching user' can keep their SQL."""
    from flight_radar_pipeline_spark.plans.queries import (
        most_active_airline_per_continent,
    )

    gold = spark.read.parquet(flight_tables["flights_gold"])
    gold.createOrReplaceTempView("flights_gold")
    try:
        got = spark.sql(
            """
            with counts as (
                select origin_continent as continent, airline_name,
                       count(*) as flight_count
                from flights_gold
                where origin_continent = destination_continent
                group by origin_continent, airline_name
            ), ranked as (
                select *, row_number() over (
                    partition by continent
                    order by flight_count desc, airline_name asc
                ) as rn
                from counts
            )
            select continent, airline_name, flight_count
            from ranked where rn = 1 order by continent
            """
        ).collect()
        want = most_active_airline_per_continent(gold).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert len(want) > 0
    finally:
        spark.catalog.dropTempView("flights_gold")
