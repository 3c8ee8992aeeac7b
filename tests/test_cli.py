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
