"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the operators the round-1
gate missed (as-of join, range join, percentiles, multimodal) now sit inside
it — so adding queries can never silently push an only-coverage entry out.

Round-6 window policy: the round-5 POST_FREEZE slate (42 oracled entries
that had never held a driver correctness row through r05) rotated in
wholesale, plus a 5-entry proven spine and the 3 round-6 additions /
reworked entries (native image-dims parsing, the end-to-end corpus
composition, and the self-sizing embedding near-dup).

Round-7 rotation prep: POST_FREEZE below holds 49 oracled entries
registered after the r6 window froze (the mid-round batches: spatial/
graph/CDC/linkage, KMV streaming, min-cost paths, the histogram-sketch
family and its streaming face, governance/statistics, multimodal
audio/video, SCD2 stream, LTV, IVF-PQ). 49 < 50, so the round-7 window
rotates the slate in wholesale plus `pricing_summary` as the proven
spine; `click_view_attribution` / `event_window_density` /
`event_value_percentiles` / `multimodal_features` (MUST_BE_CHECKED)
then need their coverage pinned by the local sweep alone for one round
— or swap two slate entries out if the driver window must keep them.
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


# entries registered AFTER the round-6 window froze (they become rotation
# candidates for round 7; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    # battery_extras (round-6 additions, registered post-freeze)
    "customer_geo_cell_pairs",
    "entity_reach_3hop",
    "event_decayed_type_scores",
    "doc_char_class_entropy",
    "lineitem_weighted_median",
    "session_overlap_pairs",
    "user_event_type_unpivot",
    "user_value_holt",
    "customer_adamic_adar",
    "doc_containment_pairs",
    "orders_cdc_apply",
    "orders_pit_segment",
    "customer_nearest_neighbor",
    "part_fs_match_weights",
    "doc_lang_kl_drift",
    "customer_k_anonymity",
    "user_kmv_rolling_7d",
    "orders_cdc_stream_apply",
    "user_degree_powerlaw",
    "user_balance_clamped",
    "part_sorted_neighborhood_pairs",
    "doc_hybrid_rrf_search",
    "nation_revenue_share",
    "entity_reach_temporal",
    "event_value_stats_merged",
    "daily_type_rank_shift",
    "embedding_label_balance",
    "user_kmv_stream_partials",
    "rollup_restatement_diff",
    "orders_lineitem_join_ivm",
    "doc_fold_label_parity",
    "event_drift_stream_moments",
    "entity_min_cost_3hop",
    "event_value_hist_quantiles",
    "view_click_crosscorr",
    "embedding_mutual_nn",
    "event_value_cdf_norm",
    "part_revenue_abc",
    "event_type_ks_drift",
    "nation_dp_customer_counts",
    "event_value_bootstrap_ci",
    "orders_scd2_stream_merge",
    "multimodal_audio_meta",
    "multimodal_video_meta",
    "nation_month_revenue_growth",
    "ab_cuped_event_value",
    "cohort_cumulative_ltv",
    "embedding_topk_ivfpq",
    "event_hist_stream_quantiles",
}


def test_round6_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01–r05 must be in the
    round-6 window (or the explicit POST_FREEZE slate for round 7) —
    the standing rotation contract: no oracled entry stays
    driver-unchecked for more than one round after registration."""
    root = pathlib.Path(__file__).resolve().parent.parent
    checked_ever: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r0[1-5].json")):
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
