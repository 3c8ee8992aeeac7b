"""battery_mining semantics beyond oracle parity: UDTF protocol edge
cases (pure Python — the eval contract must hold for inputs the synthetic
corpus never produces) and output invariants of the mining entries."""

from __future__ import annotations

import pytest

from flight_radar_pipeline_spark.plans import battery_mining as M

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# _WordSpans UDTF eval() protocol (no Spark needed — it's a generator)
# --------------------------------------------------------------------------


def _spans(text):
    # @udtf wraps the class in a UserDefinedTableFunction; the raw class
    # (and its eval generator) lives on .func
    return list(M._WordSpans.func().eval(text))


def test_word_spans_null_text_emits_nothing():
    assert _spans(None) == []


def test_word_spans_empty_string_is_one_empty_token():
    # ''.split(' ') == [''] — matches DuckDB string_split semantics
    assert _spans("") == [(0, 0, "")]


def test_word_spans_offsets_reconstruct_text():
    text = "key agg row scan"
    spans = _spans(text)
    assert [w for _, _, w in spans] == ["key", "agg", "row", "scan"]
    for pos, start, word in spans:
        assert text[start : start + len(word)] == word
    # positions are dense from 0
    assert [p for p, _, _ in spans] == list(range(len(spans)))


def test_word_spans_double_space_keeps_empty_token():
    # explicit-separator split keeps empties, exactly like string_split
    spans = _spans("a  b")
    assert spans == [(0, 0, "a"), (1, 2, ""), (2, 3, "b")]


# --------------------------------------------------------------------------
# entry output invariants at sf0.001
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mining_rows(spark):
    out = {}
    for name in (
        "part_brand_cooccurrence",
        "order_benford_digits",
        "event_value_lag_autocorr",
        "part_name_fuzzy_pairs",
    ):
        out[name] = getattr(M, name)(spark, SF_DIR)
    return {k: v.collect() for k, v in out.items()}


def test_cooccurrence_invariants(mining_rows):
    rows = mining_rows["part_brand_cooccurrence"]
    assert rows, "no co-occurring brand pairs at sf0.001"
    for r in rows:
        assert r.brand_a < r.brand_b  # canonical pair orientation
        assert r.n_both >= 1
        assert 0 < r.support <= 1
        assert 0 < r.conf_a_to_b <= 1
        assert r.lift > 0


def test_benford_digits_are_a_distribution(mining_rows):
    rows = mining_rows["order_benford_digits"]
    assert sorted(r.digit for r in rows) == sorted({r.digit for r in rows})
    assert set(r.digit for r in rows) <= set(range(1, 10))
    assert sum(r.obs_freq for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.exp_freq for r in rows) <= 1.0 + 1e-9
    assert all(r.chi2_term >= 0 for r in rows)


def test_autocorr_is_a_correlation(mining_rows):
    for r in mining_rows["event_value_lag_autocorr"]:
        if r.lag1_autocorr is not None:
            assert -1.0 <= r.lag1_autocorr <= 1.0
        if r.lag2_autocorr is not None:
            assert -1.0 <= r.lag2_autocorr <= 1.0
        assert r.n_events > 0


def test_fuzzy_pairs_block_and_threshold(mining_rows):
    rows = mining_rows["part_name_fuzzy_pairs"]
    assert rows, "no fuzzy name pairs at sf0.001"
    for r in rows:
        assert r.name_a < r.name_b
        assert 1 <= r.dist <= 3
        # blocking key: both names share the head noun
        assert r.name_a.split(" ")[1] == r.name_b.split(" ")[1]


def test_survival_curve_is_a_survival_curve(spark):
    rows = M.order_gap_survival(spark, SF_DIR).collect()
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9  # monotone non-increasing
        assert r.n_events >= 1 and r.n_risk >= r.n_events
        prev = r.survival


def test_gini_is_a_concentration_measure(spark):
    r = M.customer_revenue_gini(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert r.top_decile_share >= 0.1  # top decile holds at least its share
    assert r.n_customers > 0 and r.total_rev > 0
