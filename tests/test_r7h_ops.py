"""Invariant tests for the round-7h additions: Simpson check counting
identities, runs-test moment sanity, harmonic-fit bounds, shingle
diversity bounds, SPRT walk monotone rules, and interarrival fit
bounds."""

from __future__ import annotations

import math

import pytest

from conftest import SF_DIR
from flight_radar_pipeline_spark.plans.battery_r7h import (
    _SPRT_BOUND,
    ab_sprt_daily_decision,
    brand_simpson_check,
    doc_shingle_diversity,
    event_hourly_harmonic_fit,
    event_value_runs_test,
    order_interarrival_fit,
)


def test_simpson_counting_identities(spark):
    row = brand_simpson_check(spark, SF_DIR).collect()[0]
    assert row.n_brands == row.n_positive + row.n_negative  # slope 0 ~ never
    # sign-reversed count equals whichever side disagrees with pooled
    expect = row.n_negative if row.pooled_slope > 0 else row.n_positive
    assert row.n_sign_reversed == expect


def test_runs_test_moments(spark):
    row = event_value_runs_test(spark, SF_DIR).collect()[0]
    assert row.n_users > 0
    # each contributing user has ≥ 2 observations → at least 1 run each
    assert row.n_runs >= row.n_users
    assert row.expected_runs > row.n_users
    assert abs(row.z) < 50


def test_harmonic_fit_bounds(spark):
    row = event_hourly_harmonic_fit(spark, SF_DIR).collect()[0]
    assert row.n_hours > 0
    assert row.amplitude >= max(abs(row.a_cos), abs(row.b_sin)) - 1e-9
    assert row.amplitude <= abs(row.a_cos) + abs(row.b_sin) + 1e-9
    assert -1e-6 <= row.r2 <= 1.0 + 1e-6


def test_shingle_diversity_bounds(spark):
    rows = doc_shingle_diversity(spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 < r.avg_diversity <= 1.0
        assert 0 <= r.n_flagged <= r.n_docs


def test_sprt_walk_rules(spark):
    rows = ab_sprt_daily_decision(spark, SF_DIR).orderBy("day").collect()
    assert len(rows) >= 2
    prev = 0.0
    for r in rows:
        # per-day increment is bounded by n_events · max per-obs LLR
        per_obs = max(abs(math.log(0.21 / 0.19)), abs(math.log(0.79 / 0.81)))
        assert abs(r.cum_llr - prev) <= r.n_events * per_obs + 1e-6
        want = (
            "accept_h1"
            if r.cum_llr >= _SPRT_BOUND
            else "accept_h0"
            if r.cum_llr <= -_SPRT_BOUND
            else "continue"
        )
        assert r.decision == want
        prev = r.cum_llr


def test_interarrival_fit_bounds(spark):
    row = order_interarrival_fit(spark, SF_DIR).collect()[0]
    assert row.n_gaps > 0
    assert row.mean_gap_days > 0
    assert row.lambda_per_day == pytest.approx(
        1.0 / row.mean_gap_days, rel=1e-4
    )
    assert 0.0 <= row.ks_distance <= 1.0


def test_shingle_diversity_unicode_lower_expansion(spark):
    """Lowercasing can CHANGE the codepoint count (İ → i + U+0307), so
    n_total and the shingle position bound must stay keyed on the
    ORIGINAL text's length exactly as the oracle states them — the
    round-13 lambda-CSE hoist must not silently rebase them on the
    lowered string (review finding)."""
    from unittest import mock

    import flight_radar_pipeline_spark.plans.battery_r7h as r7h

    text = "İaİbİcİd"  # 8 codepoints; lower() expands each İ to 2
    lowered = text.lower()
    assert len(lowered) > len(text)  # the expansion this test is about
    df = spark.createDataFrame([("xx", 1, text)], "lang string, doc_id long, text string")
    with mock.patch.object(r7h, "load_table", lambda _s, _d, _t: df):
        row = r7h.doc_shingle_diversity(spark, "unused").collect()[0]
    n_total = len(text) - 3  # oracle: greatest(length(text) - 3, 1)
    shingles = {lowered[i : i + 4] for i in range(n_total)}
    assert row.n_docs == 1
    assert row.avg_diversity == round(len(shingles) / n_total, 4)
