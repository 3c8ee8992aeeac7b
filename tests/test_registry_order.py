"""The driver's correctness gate oracle-checks only the first
``CHECKED_WINDOW`` registry entries (registration order). Guard that every
entry inside the window carries an oracle and that the rotation contract
holds: no oracled entry stays driver-unchecked for more than one round
after registration.

Round-10 window policy (the round-9 verdict directive 1, verbatim): the
8-entry round-9 POST_FREEZE slate rotated in wholesale, plus
``pricing_summary`` as the proven spine, plus 41 re-checks of the stalest
green rows by (last green driver round across CORRECTNESS_r01–r09,
registry order) — the whole remaining r4 cohort plus the oldest r5 rows.
1 + 8 + 41 = 50 exactly. A green round-10 driver check takes cumulative
driver coverage to ALL 280 oracled entries.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entrymod

# the four only-coverage operators (as-of join, range join, exact
# percentiles, multimodal plumbing). They rode the round-9 window and hold
# fresh green rows in CORRECTNESS_r09; the standing contract is that they
# are never allowed to go stale past the re-check horizon.
ONLY_COVERAGE = [
    "click_view_attribution",
    "event_window_density",
    "event_value_percentiles",
    "multimodal_features",
]

# the 8-entry round-9 POST_FREEZE slate (rotated into the round-10 window)
R9_SLATE = [
    "user_hll_sparse_audit",
    "event_psi_stream_ledger",
    "event_wasserstein_stream_ledger",
    "event_value_page_hinkley",
    "supplier_part_coverage",
    "customer_kadane_window",
    "event_value_ewma_bands",
    "customer_pareto_vital_few",
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


def _last_green() -> dict[str, int]:
    """Per-entry newest round holding a fully-green driver row (r1-r9)."""
    last: dict[str, int] = {}
    for p in sorted(_ROOT.glob("CORRECTNESS_r0[1-9].json")):
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


def test_only_coverage_operators_recently_checked():
    """The four only-coverage operators must hold a green driver row no
    older than the previous round (they rode the round-9 window) — or be
    in the current window."""
    last = _last_green()
    window = set(entrymod._WINDOW)
    stale = [
        n for n in ONLY_COVERAGE if n not in window and last.get(n, 0) < 9
    ]
    assert not stale, f"only-coverage operators gone stale: {stale}"


# entries registered AFTER the round-10 window froze (they become rotation
# candidates for round 11; append here when adding queries mid-round)
POST_FREEZE: set[str] = {
    # battery_r10 (registered post-freeze): discrete allocation +
    # dominance query — both sweep-verified as uncovered families
    "nation_seat_apportionment",
    "part_price_size_skyline",
    # battery_r10b (registered post-freeze): CART split finding +
    # isotonic calibration — both sweep-verified as uncovered families
    "order_price_stump_split",
    "event_score_isotonic_fit",
    # battery_r10c (registered post-freeze): the graph family's missing
    # spanning-tree classic
    "nation_profile_mst",
}


def test_round10_window_composition():
    """The round-10 window is exactly: spine + 8-entry r9 slate + 41
    stalest-green re-checks (r9 verdict directive 1)."""
    window = entrymod._WINDOW
    assert window[0] == "pricing_summary"
    assert window[1:9] == R9_SLATE
    # the slate had never held a driver row before round 10
    checked_r19 = _driver_checked("CORRECTNESS_r0[1-9].json")
    assert not (set(R9_SLATE) & checked_r19)
    # every re-check slot holds a green row already (it IS a re-check)
    rechecks = window[9:]
    assert len(rechecks) == 41
    missing = [n for n in rechecks if n not in checked_r19]
    assert not missing, f"re-check entries without prior green rows: {missing}"
    # staleness rule: rechecks are the pool's 41 oldest by
    # (last-green round, registry order) — deterministic, no cherry-picking
    last = _last_green()
    names = list(entrymod._registry())
    order = {n: i for i, n in enumerate(names)}
    oracles = entrymod.oracle_sql()
    excluded = set(R9_SLATE) | {"pricing_summary"}
    pool = [n for n in names if n in oracles and n in last and n not in excluded]
    pool.sort(key=lambda n: (last[n], order[n]))
    assert rechecks == pool[:41]


def test_round10_window_covers_all_never_checked_oracled_entries():
    """Every oracled entry with no driver row in r01-r09 must be in the
    round-10 window (or the explicit POST_FREEZE slate for round 11) —
    the standing rotation contract: no oracled entry stays
    driver-unchecked for more than one round after registration."""
    # backlog membership counts ANY recorded row (not just hash-green),
    # so build the set from plain membership
    seen: set[str] = set()
    for p in sorted(_ROOT.glob("CORRECTNESS_r0[1-9].json")):
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
