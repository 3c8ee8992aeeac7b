"""Invariant tests for the round-7c additions, beyond the DuckDB oracle
hash (tests/test_battery.py): Soundex hand cases, the HITS path-count
recurrence on a hand graph (Fibonacci!), growth-accounting identities,
conformal coverage near its guarantee, BH ⊆ naive rejections, and
regression/readability bounds."""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from flight_radar_pipeline_spark.functions.text import soundex_code
from flight_radar_pipeline_spark.operators.graph import hits_scores
from flight_radar_pipeline_spark.plans.battery_r7c import (
    brand_discount_elasticity,
    doc_readability,
    event_type_bh_fdr,
    event_value_conformal,
    user_growth_accounting,
)
from flight_radar_pipeline_spark.sources.readers import load_table


def test_soundex_hand_cases(spark):
    """Textbook codes (all unaffected by the documented H/W
    simplification): vowels separate same-coded consonants, adjacent
    same-coded letters collapse, codes pad/truncate to 4."""
    cases = [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("PFISTER", "P236"),   # adjacent P/F share code 1 → collapse
        ("Jackson", "J250"),   # CKS run collapses to one 2
        ("Tymczak", "T522"),
        ("bob", "B100"),       # vowel separates the two Bs
        ("red", "R300"),
        ("rod", "R300"),       # the sound-alike pair the battery finds
        ("Washington", "W252"),
        ("a", "A000"),
        ("123", None),         # no letters → NULL
        ("", None),
    ]
    df = spark.createDataFrame(
        [(w,) for w, _ in cases], "word string"
    ).withColumn("code", soundex_code("word"))
    got = {r.word: r.code for r in df.collect()}
    for word, want in cases:
        assert got[word] == want, f"soundex({word!r}) = {got[word]!r}, want {want!r}"


def test_hits_hand_graph_fibonacci(spark):
    """c1→{s1,s2}, c2→{s1}: the unnormalized HITS recurrence walks the
    Fibonacci sequence — a3 = (13, 8), h3 = (21, 13) — and scores are
    the exact-integer L1 shares."""
    edges = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s1")], "src string, dst string"
    )
    rows = {(r.role, r.node): r for r in hits_scores(edges, iterations=3).collect()}
    assert rows[("authority", "s1")].paths == 13
    assert rows[("authority", "s2")].paths == 8
    assert rows[("hub", "c1")].paths == 21
    assert rows[("hub", "c2")].paths == 13
    assert rows[("authority", "s1")].score == pytest.approx(13 / 21, abs=1e-8)
    assert rows[("hub", "c1")].score == pytest.approx(21 / 34, abs=1e-8)


def test_growth_accounting_identities(spark):
    rows = user_growth_accounting(spark, SF_DIR).orderBy("day").collect()
    assert len(rows) >= 2
    # day 1: everyone is new
    assert rows[0].n_new == rows[0].n_active
    assert rows[0].n_retained == 0 and rows[0].n_resurrected == 0
    assert rows[0].n_churned == -rows[0].n_retained + 0  # lag null → 0
    prev_active = None
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
        if prev_active is not None:
            assert r.n_churned == prev_active - r.n_retained
            assert r.n_retained <= prev_active
        prev_active = r.n_active
    # total new across days = total distinct users
    users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r.n_new for r in rows) == users


def test_conformal_coverage_near_guarantee(spark):
    rows = event_value_conformal(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.qhat > 0
        assert r.n_calib > 0 and r.n_eval > 0
        # finite-sample guarantee is ≥ 0.9 in expectation over splits;
        # allow sampling slack on the fixed hash split
        assert 0.82 <= r.coverage <= 1.0


def test_bh_rejections_subset_of_naive(spark):
    rows = event_type_bh_fdr(spark, SF_DIR).collect()
    assert sum(r.n_tests for r in rows) == 120  # 5 types × 24 hours
    for r in rows:
        assert 0 <= r.n_rej_bh <= r.n_rej_raw <= r.n_tests
        assert 0.0 <= r.min_p <= 1.0


def test_elasticity_bounds(spark):
    rows = brand_discount_elasticity(spark, SF_DIR).collect()
    li_count = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r.n_lines for r in rows) == li_count
    for r in rows:
        assert -1e-9 <= r.r2 <= 1.0 + 1e-9
        assert r.slope is not None


def test_readability_bounds(spark):
    rows = doc_readability(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_easy <= r.n_docs
        assert r.avg_words_per_sentence >= 1.0
        assert r.avg_syllables_per_word >= 0.0
