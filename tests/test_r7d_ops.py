"""Invariant tests for the round-7d additions, beyond the DuckDB oracle
hash (tests/test_battery.py): the GD classifier must beat chance and the
trivial predictor, the STL decomposition must satisfy its additive
identities, Mahalanobis must find the planted correlation-breaking
outlier, and the Markov stationary vector must be a fixed-point
probability distribution."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from flight_radar_pipeline_spark.plans.battery_r7d import (
    doc_domain_classifier_gd,
    event_hourly_stl_decompose,
    event_type_markov_stationary,
    lineitem_mahalanobis_outliers,
)
from flight_radar_pipeline_spark.sources.readers import load_table


def test_domain_classifier_learns(spark):
    row = doc_domain_classifier_gd(spark, SF_DIR).collect()[0]
    n, npos = row.n_docs, row.n_pos
    assert 0 < npos < n
    # must beat chance ranking and the w=0 log-loss (ln 2)
    assert row.auc > 0.5
    assert row.train_logloss < math.log(2.0)
    # the DSIR LLR feature is the informative one (en scores highest,
    # proven by test_dsir_prefers_target_language) — GD must find it
    assert row.w_llr > 0
    assert 0.0 <= row.accuracy <= 1.0


def test_stl_identities(spark):
    rows = event_hourly_stl_decompose(spark, SF_DIR).collect()
    assert len(rows) == 24
    assert sorted(r.hour_of_day for r in rows) == list(range(24))
    # seasonal indices are centered: sum ≈ 0 (each rounded to 6)
    assert abs(sum(r.seasonal for r in rows)) < 24 * 1e-6 + 1e-9
    for r in rows:
        assert r.n_obs > 0
        assert r.mean_abs_remainder >= 0.0


def test_mahalanobis_mean_d2_is_dimension(spark):
    """E[d²] = p (= 2 features) when the stats come from the same data —
    an exact identity for the empirical Mahalanobis distance, so the
    count-weighted mean across groups must be ~2."""
    rows = lineitem_mahalanobis_outliers(spark, SF_DIR).collect()
    total = sum(r.n_lines for r in rows)
    weighted = sum(r.mean_d2 * r.n_lines for r in rows) / total
    assert weighted == pytest.approx(2.0, abs=0.02)
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_lines
        assert r.max_d2 >= r.mean_d2


def test_markov_stationary_is_distribution_and_fixed_point(spark):
    rows = event_type_markov_stationary(spark, SF_DIR).collect()
    assert len(rows) == 5
    s = sum(r.stationary_prob for r in rows)
    assert s == pytest.approx(1.0, abs=1e-4)
    e = sum(r.empirical_share for r in rows)
    assert e == pytest.approx(1.0, abs=1e-4)
    # fixed point: one more application of P moves v by < 1e-3 per entry
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window

    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w_u).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
    w_row = Window.partitionBy("cur")
    pm = trans.select(
        "cur", "nxt", (F.col("cnt") / F.sum("cnt").over(w_row)).alias("p")
    ).collect()
    v = {r.event_type: r.stationary_prob for r in rows}
    nxt = {t: 0.0 for t in v}
    for r in pm:
        nxt[r.nxt] += v[r.cur] * r.p
    for t in v:
        assert abs(nxt[t] - v[t]) < 1e-3
