"""operators/mining.py vs brute force on constructed frames — shapes the
synthetic tables never produce (single-item baskets, shared items across
every basket, repeated names, negative/fractional amounts)."""

from __future__ import annotations

import itertools
import math

import pyspark.sql.functions as F
import pytest

from flight_radar_pipeline_spark.operators.mining import (
    basket_association_rules,
    benford_digit_fit,
    blocked_fuzzy_pairs,
    lag_autocorr,
)

# deterministic pseudo-random basket set: 40 baskets over 6 items, with
# basket 0 a singleton and item "f" present in every basket
BASKETS = {
    b: sorted(
        {"abcdef"[(b * 7 + i * 3) % 6] for i in range(1 + (b * 5) % 4)} | {"f"}
    )
    for b in range(1, 40)
}
BASKETS[0] = ["a"]


def _brute_rules():
    n = len(BASKETS)
    marg = {}
    for items in BASKETS.values():
        for i in items:
            marg[i] = marg.get(i, 0) + 1
    out = {}
    for items in BASKETS.values():
        for a, b in itertools.combinations(items, 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return {
        (a, b): (
            c,
            round(c / n, 6),
            round(c / marg[a], 4),
            round(c * n / (marg[a] * marg[b]), 4),
        )
        for (a, b), c in out.items()
    }


def test_association_rules_match_brute_force(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    df = spark.createDataFrame(rows, "basket bigint, item string")
    got = {
        (r.item_a, r.item_b): (r.n_both, r.support, r.conf_a_to_b, r.lift)
        for r in basket_association_rules(df, "basket", "item").collect()
    }
    assert got == _brute_rules()


def test_association_rules_drop_null_and_empty_items(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, ""), (1, None), (2, "x"), (2, "y")],
        "basket bigint, item string",
    )
    rows = basket_association_rules(df, "basket", "item").collect()
    assert [(r.item_a, r.item_b, r.n_both) for r in rows] == [("x", "y", 2)]
    assert rows[0].support == 1.0  # '' and None never count as items


def test_benford_matches_brute_force_and_handles_sign(spark):
    amounts = [1.23, 12.9, 190.01, 2.5, 0.37, -5.0, 0.0, 911.0, 0.015]
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    got = {r.digit: (r.n_obs, r.obs_freq, r.exp_freq) for r in
           benford_digit_fit(df, "amt").collect()}
    # positives only; digit of integer cents: 123→1, 1290→1, 19001→1,
    # 250→2, 37→3, 91100→9, 1(.5 cents floored)→1
    pos = {1: 4, 2: 1, 3: 1, 9: 1}
    n = sum(pos.values())
    want = {
        d: (c, round(c / n, 6), round(math.log10(1 + 1 / d), 6))
        for d, c in pos.items()
    }
    assert got == want


def test_benford_excludes_subcent_amounts(spark):
    """Amounts in (0, 0.01) floor to 0 cents — digit 0 has no Benford
    expectation (log10(1 + 1/0) divides by zero: Spark NULL, DuckDB inf),
    so the domain filter keeps only integer cents >= 1 and the output
    holds digits 1-9 exclusively on any engine."""
    df = spark.createDataFrame(
        [(0.004,), (0.0099,), (0.01,), (3.0,)], "amt double"
    )
    rows = benford_digit_fit(df, "amt").collect()
    assert {r.digit for r in rows} == {1, 3}  # 0.01→1 cent→digit 1; 3.0→300
    assert all(r.exp_freq is not None and r.chi2_term is not None for r in rows)


def test_lag_autocorr_alternating_series_is_minus_one(spark):
    # x, -x, x, -x ... → lag-1 r = -1, lag-2 r = +1 exactly
    rows = [("k", i, float((-1) ** i)) for i in range(20)]
    df = spark.createDataFrame(rows, "key string, seq bigint, v double")
    r = lag_autocorr(df, "key", "v", order_cols=["seq"], lags=(1, 2)).collect()[0]
    assert r.lag1_autocorr == pytest.approx(-1.0, abs=1e-9)
    assert r.lag2_autocorr == pytest.approx(1.0, abs=1e-9)
    assert r.n_rows == 20


def test_blocked_fuzzy_pairs_rejects_empty_block_list(spark):
    df = spark.createDataFrame([("a",)], "nm string")
    with pytest.raises(ValueError, match="blocking function"):
        blocked_fuzzy_pairs(df, "nm", [])


def test_blocked_fuzzy_pairs_respects_blocks_and_threshold(spark):
    names = ["red bolt", "ted bolt", "red ring", "bed bolt", "red bolt"]
    df = spark.createDataFrame([(n,) for n in names], "nm string")
    got = {
        (r.name_a, r.name_b): r.dist
        for r in blocked_fuzzy_pairs(
            df, "nm", lambda c: F.split_part(c, F.lit(" "), F.lit(2)), max_dist=1
        ).collect()
    }
    # duplicates collapse (distinct); "red ring" is in another block;
    # within the bolt block only single-substitution pairs survive
    assert got == {
        ("bed bolt", "red bolt"): 1,
        ("bed bolt", "ted bolt"): 1,
        ("red bolt", "ted bolt"): 1,
    }


def test_blocking_recall_measured_against_full_quadratic(spark):
    """Blocking trades recall for cost — measured, not assumed. On the
    part-name universe the full quadratic O(|names|²) comparison is
    feasible (linkage runs on the DISTINCT-name dimension), so the trade
    is pinned exactly: head-noun blocking misses the pairs whose edits
    fall inside the noun itself ("blue bolt"/"blue rod"), while
    multi-pass blocking (one pass per token) recalls everything. Both
    modes must stay free of false positives."""
    from flight_radar_pipeline_spark.sources.readers import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    names = sorted(r.p_name for r in part.select("p_name").distinct().collect())

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exhaustive = {
        (a, b): lev(a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if lev(a, b) <= 3
    }
    noun = lambda c: F.split_part(c, F.lit(" "), F.lit(2))  # noqa: E731
    adj = lambda c: F.split_part(c, F.lit(" "), F.lit(1))  # noqa: E731

    single = {
        (r.name_a, r.name_b): r.dist
        for r in blocked_fuzzy_pairs(part, "p_name", noun, 3).collect()
    }
    multi = {
        (r.name_a, r.name_b): r.dist
        for r in blocked_fuzzy_pairs(part, "p_name", [noun, adj], 3).collect()
    }
    # no false positives in either mode
    assert set(single) <= set(exhaustive)
    assert all(exhaustive[k] == v for k, v in single.items())
    # single-pass loses exactly the cross-noun pairs (16 of 94 here)
    missed = set(exhaustive) - set(single)
    assert missed and all(a.split(" ")[1] != b.split(" ")[1] for a, b in missed)
    assert len(single) / len(exhaustive) >= 0.8
    # multi-pass blocking is lossless on this universe
    assert multi == exhaustive


def test_km_survival_matches_hand_computation(spark):
    """Textbook K-M fixture: durations [1e,2e,2e,3c,4e,5c] (e=event,
    c=censored). S(1)=5/6; S(2)=5/6·(3/5)=0.5; S(4)=0.5·(1/2)=0.25."""
    from flight_radar_pipeline_spark.operators.mining import km_survival

    rows = [(1, True), (2, True), (2, True), (3, False), (4, True), (5, False)]
    df = spark.createDataFrame(rows, "dur int, ev boolean")
    got = {r.duration: (r.n_risk, r.n_events, r.survival) for r in
           km_survival(df, "dur", "ev").collect()}
    assert got == {
        1: (6, 1, round(5 / 6, 6)),
        2: (5, 2, 0.5),
        4: (2, 1, 0.25),
    }


def test_km_full_depletion_reaches_zero_without_error(spark):
    from flight_radar_pipeline_spark.operators.mining import km_survival

    df = spark.createDataFrame([(1, True), (2, True)], "dur int, ev boolean")
    rows = km_survival(df, "dur", "ev").collect()
    assert [(r.duration, r.survival) for r in rows] == [(1, 0.5), (2, 0.0)]


def test_gini_extremes(spark):
    from flight_radar_pipeline_spark.operators.mining import gini_coefficient

    # perfect equality → 0
    eq = spark.createDataFrame([(i, 10.0) for i in range(20)], "id int, v double")
    r = gini_coefficient(eq, "v", "id").collect()[0]
    assert r.gini == 0.0
    assert r.top_share == pytest.approx(2 / 20 * 1.0, abs=1e-6)
    # one holder of everything → (n-1)/n
    one = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 20)], "id int, v double"
    )
    r = gini_coefficient(one, "v", "id").collect()[0]
    assert r.gini == pytest.approx(19 / 20, abs=1e-6)
    assert r.top_share == 1.0
