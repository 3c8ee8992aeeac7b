"""Shuffle-budget regression guard for the headline entries.

`tests/test_plan_hygiene.py` bans categorical scale-killers (row-Python,
cartesian, unlisted BNLJ); this pins the QUANTITY dimension: each
headline entry's Exchange count must stay within a small headroom of its
engineered plan (PLANS_AUDIT.md). A refactor that silently doubles the
shuffles — e.g. a lineage split that makes Catalyst recompute a scan per
consumer, the exact failure mode the cooccurrence entry was rewritten to
avoid — fails here instead of merely drifting a record file.

Budgets are the audited static-plan counts + 2 headroom (AQE may remove
exchanges at runtime but the static plan is what's pinned; legitimate
plan changes should update the budget alongside PLANS_AUDIT.md).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

# entry -> max allowed Exchange nodes in the static executed plan
BUDGET = {
    "pricing_summary": 4,
    "revenue_by_nation": 8,
    "doc_boilerplate_spans": 4,
    "signup_click_purchase_funnel": 4,
    "customer_7d_order_sum": 4,
    "embedding_pq_audit": 3,
    "embedding_near_dup_pairs": 7,
    "embedding_semantic_dedup": 6,
    "event_type_transitions": 9,
    "part_brand_cooccurrence": 6,
    "doc_word_spans_udtf": 4,
    "entity_pagerank": 25,
    # round-6 additions (audited static counts + 2 headroom).
    # customer_adamic_adar and doc_containment_pairs are deliberately NOT
    # budgeted: both persist a shared relation, so their static plans
    # differ between cached and uncached session states (the same class
    # as the sketch-pair-cache entries above).
    "customer_geo_cell_pairs": 4,
    "session_overlap_pairs": 6,
    "user_kmv_rolling_7d": 10,
    "doc_hybrid_rrf_search": 12,
    "event_value_stats_merged": 5,
    # round-10b/c additions (audited static counts + 2 headroom)
    "order_price_stump_split": 15,
    "event_score_isotonic_fit": 5,
    "nation_profile_mst": 3,
    # round-12 compressions (audited static counts + 2 headroom) — the
    # final lift plan reads its checkpointed ≤31-row stats grid, so its
    # static count is assembly-only; the grid subplan is budget-checked
    # via PLANS_AUDIT's [grid:basket_stats] row
    "event_type_policy_replay": 7,
    "session_event_type_lift": 6,
}
# deliberately NOT budgeted: entries consuming the shared sketch-pair
# cache (ngram_jaccard_pairs, edit_distance_near_dup, ...) — their static
# plans legitimately differ between cached (InMemoryTableScan) and
# uncached sessions, so an exchange count pinned in one state
# false-fails in the other (seen in the full-suite ordering)


@pytest.mark.parametrize("name", sorted(BUDGET))
def test_exchange_budget(name, spark):
    fn = entrymod.queries()[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    # count Exchange nodes, not ReusedExchange (reuse is free)
    n = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
    assert n <= BUDGET[name], (
        f"{name}: {n} exchanges > budget {BUDGET[name]} — a lineage split or "
        "lost broadcast? compare PLANS_AUDIT.md and update the budget only "
        "if the new plan is intentional"
    )
