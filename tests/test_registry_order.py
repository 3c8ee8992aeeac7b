"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the rotation contract
holds: no oracled entry stays driver-unchecked for more than one round
after registration.

Round-7 window policy (the final slate of the rotation contract): the
49-entry round-6 POST_FREEZE slate rotated in wholesale plus
``pricing_summary`` as the proven spine (49 + 1 = 50 exactly). A green
round-7 driver check takes cumulative driver coverage to ALL oracled
entries registered through round 6.

MUST_BE_CHECKED relaxation, decided explicitly per the round-6 verdict:
the four only-coverage operators (as-of join, range join, exact
percentiles, multimodal decode) rotate OUT for this one round. The
contract weakens from "in the window" to "in the window OR holding a
green driver row in a recorded CORRECTNESS round" — each of the four has
a fully-green row in CORRECTNESS_r06.json, and the full-registry oracle
sweep (tests/test_battery.py) pins them locally every run.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entrymod

MUST_BE_CHECKED = [
    "click_view_attribution",   # only battery coverage of the as-of join
    "event_window_density",     # only battery coverage of the range join
    "event_value_percentiles",
    "multimodal_features",
]

_ROOT = pathlib.Path(__file__).resolve().parent.parent


def _driver_checked(glob: str) -> set[str]:
    """Names holding a fully-green driver row in matching CORRECTNESS files."""
    checked: set[str] = set()
    for p in sorted(_ROOT.glob(glob)):
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            for name, row in qs.items():
                if isinstance(row, dict) and row.get("hash_match"):
                    checked.add(name)
    return checked


def test_checked_window_is_fully_oracled():
    names = list(entrymod._registry())
    oracles = entrymod.oracle_sql()
    window = names[: entrymod.CHECKED_WINDOW]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"oracle-less queries inside the checked window: {missing}"


def test_window_is_exactly_the_explicit_list():
    names = list(entrymod._registry())
    assert names[: entrymod.CHECKED_WINDOW] == entrymod._WINDOW
    assert len(entrymod._WINDOW) == entrymod.CHECKED_WINDOW
    assert len(set(entrymod._WINDOW)) == entrymod.CHECKED_WINDOW


def test_unique_operator_coverage_pinned():
    """Round-7 relaxed form: each only-coverage operator is either inside
    the driver window or already holds a green driver row on record."""
    window = set(entrymod._WINDOW)
    green_ever = _driver_checked("CORRECTNESS_r0[1-6].json")
    out = [n for n in MUST_BE_CHECKED if n not in window and n not in green_ever]
    assert not out, f"only-coverage queries with no driver evidence: {out}"


# entries registered AFTER the round-7 window froze (they become rotation
# candidates for round 8; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    "multimodal_jpeg_dims",
    "embedding_topk_ivfpq_refined",
    # battery_r7 (registered post-freeze)
    "order_priority_chisq",
    "event_value_theil_sen",
    "nation_trade_balance",
    "orders_backfill_gap_audit",
    "event_value_spearman",
    "event_session_bounce",
    "embedding_ivf_cell_balance",
    "orders_scd3_merge",
    "embedding_matryoshka_audit",
    "customer_l_diversity",
    "corpus_zipf_fit",
    "event_type_burstiness",
    "orders_scd3_stream_merge",
    # battery_r7b (registered post-freeze)
    "event_value_mann_whitney",
    "event_type_kruskal_wallis",
    "customer_t_closeness",
    "doc_dsir_importance",
    "doc_lang_temperature_sample",
    "embedding_mmr_topk",
    # battery_r7c (registered post-freeze)
    "brand_discount_elasticity",
    "user_growth_accounting",
    "doc_readability",
    "event_type_bh_fdr",
    "event_value_conformal",
    "part_soundex_blocks",
    "entity_hits_scores",
    # battery_r7d (registered post-freeze)
    "doc_domain_classifier_gd",
    "event_hourly_stl_decompose",
    "lineitem_mahalanobis_outliers",
    "event_type_markov_stationary",
    # battery_r7e (registered post-freeze)
    "embedding_ann_ndcg",
    "nation_supplier_concentration",
    "user_growth_stream_ledger",
    # battery_r7f (registered post-freeze)
    "doc_bpe_fertility",
    "doc_span_corruption_plan",
    "doc_ngram_novelty",
    "embedding_contrastive_triplets",
    "user_type_entropy_profile",
    # battery_r7g (registered post-freeze)
    "entity_kcore_peeling",
    "doc_proximity_search",
    "signup_purchase_latency_quantiles",
    # battery_r7h (registered post-freeze — closes the slate at 49,
    # so the round-8 window is again slate + pricing_summary = 50)
    "brand_simpson_check",
    "event_value_runs_test",
    "event_hourly_harmonic_fit",
    "doc_shingle_diversity",
    "ab_sprt_daily_decision",
    "order_interarrival_fit",
}


def test_post_freeze_slate_is_exactly_the_round8_window():
    """49 slate entries + pricing_summary = the 50-slot round-8 window,
    the same pre-agreed rotation mechanism rounds 5–7 used."""
    assert len(POST_FREEZE) == 49


def test_round7_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01–r06 must be in the
    round-7 window (or the explicit POST_FREEZE slate for round 8) —
    the standing rotation contract: no oracled entry stays
    driver-unchecked for more than one round after registration."""
    checked_ever: set[str] = set()
    for p in sorted(_ROOT.glob("CORRECTNESS_r0[1-6].json")):
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            checked_ever |= set(qs)
    oracles = entrymod.oracle_sql()
    never = [n for n in entrymod._registry() if n not in checked_ever and n in oracles]
    out = [n for n in never if n not in set(entrymod._WINDOW) | POST_FREEZE]
    assert not out, f"never-driver-checked oracled entries outside window: {out}"


def test_tail_entries_are_outside_window():
    names = list(entrymod._registry())
    tail = entrymod._tail_names()
    assert names[entrymod.CHECKED_WINDOW:] == tail
    assert set(tail) & set(entrymod._WINDOW) == set()
