"""Unit tests for the round-8c operators: CUSUM changepoint recovery on
a constructed level shift, and Johnson–Lindenstrauss projection
determinism + distance-preservation sanity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.linalg import (
    jl_project,
    jl_sign_matrix,
)
from flight_radar_pipeline_spark.operators.temporal import cusum_changepoint


def test_cusum_finds_a_constructed_level_shift(spark):
    """Series 0,0,...,0 (10) then 5,5,...,5 (10): x̄ = 2.5, S_t walks to
    −25 exactly at the shift boundary (t = 10) and back to 0 — the
    argmax|S| day is the last pre-shift point, z = 25/(2.5·√20)."""
    rows = [("a", t, 0.0) for t in range(1, 11)] + [
        ("a", t, 5.0) for t in range(11, 21)
    ]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    out = cusum_changepoint(df, "g", "t", "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r.change_t == 10
    assert r.n_points == 20
    assert abs(r.cusum_peak - 25.0) < 1e-9
    assert abs(r.cusum_z - 25.0 / (2.5 * math.sqrt(20))) < 1e-3


def test_cusum_stable_series_scores_low(spark):
    """An alternating ±1 series has tiny partial sums: z ≪ the shifted
    series' z, and the peak is bounded by one step."""
    rows = [("flat", t, float(1 if t % 2 else -1)) for t in range(1, 41)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    r = cusum_changepoint(df, "g", "t", "x").collect()[0]
    assert r.cusum_peak <= 1.0 + 1e-9
    assert r.cusum_z < 0.2


def test_cusum_tie_breaks_on_earliest_t(spark):
    """Symmetric two-point series: |S_1| = |S_1| only at t=1 (S_2 = 0);
    a flat pair keeps the earliest index deterministically."""
    df = spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, 1.0)], "g string, t int, x double"
    )
    r = cusum_changepoint(df, "g", "t", "x").collect()[0]
    assert r.change_t == 1 and r.cusum_peak == 0.0
    assert r.cusum_z is None  # sd = 0: nothing to grade, not a crash


def test_jl_sign_matrix_deterministic_and_pm1():
    m1 = jl_sign_matrix(8, 4)
    m2 = jl_sign_matrix(8, 4)
    assert m1 == m2
    assert all(v in (1, -1) for row in m1 for v in row)
    assert jl_sign_matrix(8, 4, salt="other") != m1


def test_jl_project_shape_and_determinism(spark):
    vecs = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda d: F.sin(F.col("id") * 1.7 + d),
        ).alias("embedding"),
    )
    out1 = jl_project(vecs, 32, 8).collect()
    out2 = jl_project(vecs, 32, 8).collect()
    assert all(len(r.jl_vec) == 8 for r in out1)
    assert [r.jl_vec for r in sorted(out1, key=lambda r: r.vec_id)] == [
        r.jl_vec for r in sorted(out2, key=lambda r: r.vec_id)
    ]


def test_jl_project_preserves_norms_statistically(spark):
    """E[‖Rv/√k‖²] = ‖v‖² for ±1/√k projections; with k = 16 the per-
    vector ratio concentrates — every ratio within [0.3, 3] and the
    mean within 25% of 1 is a loose-but-breakable band (a wrong scale
    factor, a dropped dim, or a non-± matrix all fail it)."""
    vecs = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: F.cos(F.col("id") * 0.9 + d * 1.3),
        ).alias("embedding"),
    )
    rows = jl_project(vecs, 64, 16).collect()
    ratios = []
    for r in rows:
        n_in = sum(x * x for x in r.embedding)
        n_out = sum(x * x for x in r.jl_vec)
        ratios.append(n_out / n_in)
    assert all(0.3 < x < 3.0 for x in ratios), sorted(ratios)[:3]
    mean = sum(ratios) / len(ratios)
    assert 0.75 < mean < 1.25, mean


def test_sessionize_capped_max_events_truncates(spark):
    """max_events bounds per-user fold state: with 30 events and a
    10-event cap, n_events reports the capped count and breaks only
    count within the kept prefix."""
    from flight_radar_pipeline_spark.operators.temporal import (
        sessionize_capped,
    )

    rows = [("u", i * 100) for i in range(30)]  # 100s apart, no breaks
    df = spark.createDataFrame(rows, "user_id string, t long").select(
        "user_id", F.col("t").cast("timestamp").alias("ts")
    )
    r = sessionize_capped(
        df, "user_id", "ts", gap_seconds=1000,
        max_duration_seconds=10_000_000, max_events=10,
    ).collect()[0]
    assert r.n_events == 10
    assert r.n_sessions == 1 and r.n_gap_breaks == 0 and r.n_cap_breaks == 0


def test_calibration_top_edge_closes(spark):
    """score = 1.0 must land in the LAST bin, not a phantom 11th."""
    from flight_radar_pipeline_spark.operators.mining import (
        calibration_report,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (0.999, 1), (0.0, 0)], "s double, y int"
    )
    rows = {r.bin: r for r in calibration_report(df, "s", "y", 10).collect()}
    assert set(rows) == {0, 9}
    assert rows[9].n == 2


def test_calibration_clamps_out_of_range_scores(spark):
    from flight_radar_pipeline_spark.operators.mining import (
        calibration_report,
    )

    df = spark.createDataFrame(
        [(-0.5, 0), (1.7, 1)], "s double, y int"
    )
    rows = {r.bin: r for r in calibration_report(df, "s", "y", 10).collect()}
    assert set(rows) == {0, 9}
    assert rows[0].mean_pred == 0.0 and rows[9].mean_pred == 1.0


def test_benford_second_digit_drops_single_digit_cents(spark):
    """Amounts under 0.10 (single-digit cents) have no second digit and
    must be excluded from the domain, not mis-parsed."""
    from flight_radar_pipeline_spark.operators.mining import (
        benford_second_digit_fit,
    )

    df = spark.createDataFrame(
        [(0.05,), (0.09,), (1.23,)], "amount double"
    )
    rows = benford_second_digit_fit(df, "amount").collect()
    assert sum(r.n_obs for r in rows) == 1  # only 1.23 (cents=123) counts
    assert rows[0].digit == 2  # second digit of '123'


def test_parsed_sql_sites_backtick_quote_vec_col(spark):
    """The parsed-SQL construction rewrites (round 13) interpolate
    ``vec_col`` into SQL fragments; a column name needing quoting must
    keep working exactly as the F.col form did (round-14 ADVICE)."""
    from flight_radar_pipeline_spark.operators.linalg import (
        int8_quantization_error,
    )

    rows = [(0, [1.0, -1.0]), (1, [0.5, 0.25]), (2, [2.0, 0.0])]
    odd = spark.createDataFrame(
        rows, "`the id` long, `my vec` array<double>"
    )
    plain = spark.createDataFrame(rows, "vid long, v array<double>")
    got = {
        r[0]: r[1]
        for r in int8_quantization_error(
            odd, vec_col="my vec", id_col="the id", n_dims=2
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in int8_quantization_error(
            plain, vec_col="v", id_col="vid", n_dims=2
        ).collect()
    }
    assert got == want

    out = jl_project(
        spark.createDataFrame(rows, "vid long, `my vec` array<double>"),
        2,
        4,
        vec_col="my vec",
    )
    assert len(out.collect()) == 3
