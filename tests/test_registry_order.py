"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the rotation contract
holds: no oracled entry stays driver-unchecked for more than one round
after registration.

Round-8 window policy (the standing rotation contract): the 49-entry
round-7 POST_FREEZE slate rotated in wholesale plus ``pricing_summary``
as the proven spine (49 + 1 = 50 exactly). A green round-8 driver check
takes cumulative driver coverage to ALL 252 oracled entries registered
through round 7 — every oracle-paired query driver-checked at least once.

MUST_BE_CHECKED relaxation (standing since round 6, re-pinned explicitly
per round-7 verdict item 6): the four only-coverage operators (as-of
join, range join, exact percentiles, multimodal decode) stay OUT a
second consecutive round — a decision, not an accident. The contract is
"in the window OR holding a green driver row in a recorded CORRECTNESS
round" — each of the four has a fully-green row in CORRECTNESS_r06.json,
their plans are unchanged since (tools/audit_compare.py), and the
full-registry oracle sweep (tests/test_battery.py) pins them locally
every run. They are first in line for the round-9 window spine.
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


# entries registered AFTER the round-8 window froze (they become rotation
# candidates for round 9; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    # battery_r8 (registered post-freeze): the staged round-7 library
    # operators wrapped as oracled entries per the round-7 verdict
    "user_sessions_capped",
    "lineitem_benford_second_digit",
    "event_score_calibration",
    "doc_mixture_reweight",
    "orders_window_builtins",
    # battery_r8b (registered post-freeze)
    "event_value_irls_logistic",
    "event_hour_pinball_p90",
    "customer_geo_dbscan",
    "part_golden_records",
    "multimodal_bmp_decode",
    # battery_r8c (registered post-freeze)
    "event_value_cusum_changepoint",
    "embedding_jl_distortion",
    # battery_r8d (registered post-freeze)
    "event_value_psi_drift",
    "event_score_ks_separation",
    "doc_mixture_schedule",
    "event_cusum_stream_ledger",
    # battery_r8e (registered post-freeze)
    "nation_order_jackknife",
    "event_hourly_haar_energy",
    "ab_power_mde",
    "event_value_wasserstein_drift",
}


def test_round8_window_is_slate_plus_spine():
    """The round-8 window is exactly the 49-entry round-7 POST_FREEZE
    slate + pricing_summary — the same pre-agreed rotation mechanism
    rounds 5–7 used (each produced a 50/50 green driver check)."""
    r7_slate = set(entrymod._WINDOW) - {"pricing_summary"}
    assert len(r7_slate) == 49
    checked_r17 = _driver_checked("CORRECTNESS_r0[1-7].json")
    # nothing in the slate has ever held a driver row before this round
    assert not (r7_slate & checked_r17)


def test_round8_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01–r07 must be in the
    round-8 window (or the explicit POST_FREEZE slate for round 9) —
    the standing rotation contract: no oracled entry stays
    driver-unchecked for more than one round after registration."""
    checked_ever: set[str] = set()
    for p in sorted(_ROOT.glob("CORRECTNESS_r0[1-7].json")):
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
