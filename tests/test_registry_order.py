"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the rotation contract
holds: no oracled entry stays driver-unchecked for more than one round
after registration.

Round-9 window policy (the round-8 verdict directive 1, verbatim): the
20-entry round-8 POST_FREEZE slate rotated in wholesale, plus
``pricing_summary`` as the proven spine, plus the 4 MUST_BE_CHECKED
only-coverage operators (their last driver rows are CORRECTNESS_r06),
plus 25 re-checks of the stalest green rows (every r1/r3-era entry, then
the oldest r4 cohort in registry order). 1 + 20 + 4 + 25 = 50 exactly.
A green round-9 driver check takes cumulative driver coverage to ALL 272
oracled entries — the never-checked backlog drains to zero.
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

# the 20-entry round-8 POST_FREEZE slate (rotated into the round-9 window)
R8_SLATE = {
    "user_sessions_capped",
    "lineitem_benford_second_digit",
    "event_score_calibration",
    "doc_mixture_reweight",
    "orders_window_builtins",
    "event_value_irls_logistic",
    "event_hour_pinball_p90",
    "customer_geo_dbscan",
    "part_golden_records",
    "multimodal_bmp_decode",
    "event_value_cusum_changepoint",
    "embedding_jl_distortion",
    "event_value_psi_drift",
    "event_score_ks_separation",
    "doc_mixture_schedule",
    "event_cusum_stream_ledger",
    "nation_order_jackknife",
    "event_hourly_haar_energy",
    "ab_power_mde",
    "event_value_wasserstein_drift",
}

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


def _last_green() -> dict[str, int]:
    """Per-entry newest round holding a fully-green driver row (r1-r8)."""
    last: dict[str, int] = {}
    for p in sorted(_ROOT.glob("CORRECTNESS_r0[1-8].json")):
        rnd = int(p.stem.split("_r")[1])
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            for name, row in qs.items():
                if isinstance(row, dict) and row.get("hash_match"):
                    last[name] = max(last.get(name, 0), rnd)
    return last


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
    """Round-9 form: all four only-coverage operators are IN the window
    (the round-8 verdict made them part of the round-9 spine)."""
    window = set(entrymod._WINDOW)
    out = [n for n in MUST_BE_CHECKED if n not in window]
    assert not out, f"only-coverage queries missing from the round-9 window: {out}"


# entries registered AFTER the round-9 window froze (they become rotation
# candidates for round 10; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    # battery_r9 (registered post-freeze): the round-8 verdict's
    # directive-7 candidates (the reservoir one was dropped — the
    # registry already holds doc_stratified_sample/doc_weighted_sample)
    "user_hll_sparse_audit",
    "event_psi_stream_ledger",
    "event_wasserstein_stream_ledger",
    # battery_r9b (registered post-freeze)
    "event_value_page_hinkley",
    # battery_r9c (registered post-freeze): combinatorial / series
    "supplier_part_coverage",
    "customer_kadane_window",
    # battery_r9d (registered post-freeze): SPC / Pareto
    "event_value_ewma_bands",
    "customer_pareto_vital_few",
}


def test_round9_window_composition():
    """The round-9 window is exactly: spine + 20-entry r8 slate + 4
    MUST_BE_CHECKED + 25 stalest-green re-checks (r8 verdict directive 1)."""
    window = entrymod._WINDOW
    assert window[0] == "pricing_summary"
    assert set(window[1:21]) == R8_SLATE
    assert window[21:25] == MUST_BE_CHECKED
    # the slate had never held a driver row before round 9
    checked_r18 = _driver_checked("CORRECTNESS_r0[1-8].json")
    assert not (R8_SLATE & checked_r18)
    # every re-check slot holds a green row already (it IS a re-check)
    rechecks = window[25:]
    assert len(rechecks) == 25
    missing = [n for n in rechecks if n not in checked_r18]
    assert not missing, f"re-check entries without prior green rows: {missing}"
    # staleness rule: rechecks are the pool's 25 oldest by
    # (last-green round, registry order) — deterministic, no cherry-picking
    last = _last_green()
    names = list(entrymod._registry())
    order = {n: i for i, n in enumerate(names)}
    oracles = entrymod.oracle_sql()
    excluded = R8_SLATE | set(MUST_BE_CHECKED) | {"pricing_summary"}
    pool = [n for n in names if n in oracles and n in last and n not in excluded]
    pool.sort(key=lambda n: (last[n], order[n]))
    assert rechecks == pool[:25]


def test_round9_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01-r08 must be in the
    round-9 window (or the explicit POST_FREEZE slate for round 10) —
    the standing rotation contract: no oracled entry stays
    driver-unchecked for more than one round after registration."""
    # backlog membership counts ANY recorded row (not just hash-green),
    # so build the set from plain membership
    seen: set[str] = set()
    for p in sorted(_ROOT.glob("CORRECTNESS_r0[1-8].json")):
        d = json.loads(p.read_text())
        qs = d.get("queries", d)
        if isinstance(qs, dict):
            seen |= set(qs)
    oracles = entrymod.oracle_sql()
    never = [n for n in entrymod._registry() if n not in seen and n in oracles]
    out = [n for n in never if n not in set(entrymod._WINDOW) | POST_FREEZE]
    assert not out, f"never-driver-checked oracled entries outside window: {out}"


def test_tail_entries_are_outside_window():
    names = list(entrymod._registry())
    tail = entrymod._tail_names()
    assert names[entrymod.CHECKED_WINDOW:] == tail
    assert set(tail) & set(entrymod._WINDOW) == set()
