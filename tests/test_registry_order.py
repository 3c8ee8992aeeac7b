"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the operators the round-1
gate missed (as-of join, range join, percentiles, multimodal) now sit inside
it — so adding queries can never silently push an only-coverage entry out.

Round-5 window policy: the explicit ``_WINDOW`` list holds every oracled
entry that had never held a driver correctness row in CORRECTNESS_r01–r04,
plus a proven 7-entry spine.
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


def test_unique_operator_coverage_inside_window():
    window = set(entrymod._WINDOW)
    out = [n for n in MUST_BE_CHECKED if n not in window]
    assert not out, f"only-coverage queries outside the checked window: {out}"


# entries registered AFTER the round-5 window froze (they become rotation
# candidates for round 6; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    "doc_heavy_hitters",
    "event_value_interpolated",
    "doc_bpe_encode",
    "event_value_winsorized",
    "user_value_ewma",
    "embedding_group_centroids",
    "doc_source_report",
    "corpus_filter_funnel",
    "referential_integrity_audit",
    "user_erasure_audit",
    "event_value_woe_bins",
    "order_status_psi_drift",
    "session_event_type_lift",
    "nation_revenue_view_ivm",
    "event_hourly_mean_shift",
    "distinct_user_event_types_within_wm_stream",
    "purchase_multitouch_attribution",
    "ab_test_event_value",
    "top_session_paths",
    "daily_rollup_stream_merge",
    "doc_hashing_tf",
    "user_value_twap",
    "event_type_hour_mutual_info",
    "embedding_cosine_histogram",
    "orders_table_checksum",
    "orders_customer_key_overlap_kmv",
    "top_users_stream",
    "doc_topic_clusters",
    "customer_rfm_segments",
    "event_props_variant",
    "orders_schema_evolution",
    "shipping_latency_sla",
    # battery_mining (added late round-5)
    "part_brand_cooccurrence",
    "order_benford_digits",
    "event_value_lag_autocorr",
    "event_seasonal_baseline",
    "part_name_fuzzy_pairs",
    "doc_word_spans_udtf",
    "view_click_full_outer_stream",
    "order_gap_survival",
    "customer_revenue_gini",
    "peak_concurrent_sessions",
}


def test_round5_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01–r04 must be in the
    round-5 window — this is the rotation contract from VERDICT r4 item 2."""
    root = pathlib.Path(__file__).resolve().parent.parent
    checked_ever: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r0[1-4].json")):
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
