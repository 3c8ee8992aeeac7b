"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``flight_radar_pipeline_spark.plans.battery`` (one
QuerySpec per operator from SURVEY.md §2, DataFrame builder + DuckDB oracle
side by side).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> None:
    """Engine conf on the driver-provided session: UTC so naive-timestamp
    presentation agrees with DuckDB; nanos escape hatch for events.parquet;
    AQE for runtime re-planning."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build — defaults still correct


# The driver's correctness gate checks the FIRST 50 registry entries only,
# so the window below is an EXPLICIT list (registration order stopped being
# a safe implicit ordering once the registry outgrew 50 entries).
#
# Round-10 rotation — the standing pre-agreed rotation contract
# (tests/test_registry_order.py), composed exactly as the round-9 verdict
# directive 1 prescribed:
#   (a) `pricing_summary` as the proven spine.
#   (b) the 8-entry round-9 POST_FREEZE slate (every oracled entry
#       registered after the round-9 window froze — none has ever held a
#       driver correctness row). A green round takes cumulative driver
#       coverage to ALL 280 oracled entries.
#   (c) 41 re-checks of the STALEST green rows by (last green driver
#       round across CORRECTNESS_r01–r09, registry order) — the deepest
#       re-verification budget the rotation has ever had: the whole r4
#       cohort's remaining 35 rows plus the 6 oldest r5 rows. Plans are
#       drift-audited (tools/audit_compare.py), but a driver-side
#       re-check of r4/r5-era rows is the cheapest possible insurance.
# 1 + 8 + 41 = 50 exactly.
#
# Demoted entries (the whole round-9 window minus the spine) all hold
# green rows in CORRECTNESS_r09.json; tests/test_battery.py's
# full-registry oracle sweep (ALL entries at sf0.001) remains the
# mandatory regression net for everything outside the window. Entries
# WITHOUT an oracle stay in the tail by policy (embedding_opq_audit +
# the approx-percentile twins + HLL + first-fit packing:
# non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # (a) proven spine
    "pricing_summary",
    # (b) the round-9 POST_FREEZE slate, wholesale (8 — never driver-checked)
    "user_hll_sparse_audit",
    "event_psi_stream_ledger",
    "event_wasserstein_stream_ledger",
    "event_value_page_hinkley",
    "supplier_part_coverage",
    "customer_kadane_window",
    "event_value_ewma_bands",
    "customer_pareto_vital_few",
    # (c) 41 stalest-green re-checks (last green round in comment)
    "supplier_nation_enrich",        # r4
    "doc_lang_id",                   # r4
    "doc_exact_dedup",               # r4
    "minhash_near_dup_pairs",        # r4
    "near_dup_clusters",             # r4
    "simhash_near_dup_pairs",        # r4
    "top_pmi_collocations",          # r4
    "embedding_topk_bruteforce",     # r4
    "doc_quality_score",             # r4
    "ngram_jaccard_pairs",           # r4
    "doc_bm25_query",                # r4
    "embedding_topk_ivf",            # r4
    "embedding_kmeans_clusters",     # r4
    "embedding_semantic_dedup",      # r4
    "click_view_pairs_stream",       # r4
    "orders_scd2_history",           # r4
    "orders_scd1_merge",             # r4
    "lineitem_price_stats",          # r4
    "weekly_cohort_retention",       # r4
    "hourly_timeline_dense",         # r4
    "user_event_type_pivot",         # r4
    "customer_7d_order_sum",         # r4
    "customers_without_orders",      # r4
    "order_status_cube",             # r4
    "priority_weighted_price",       # r4
    "segment_revenue_salted_join",   # r4
    "user_sessions",                 # r4
    "snapshot_diff",                 # r4
    "orders_bloom_semi_join",        # r4
    "doc_train_eval_split",          # r4
    "doc_lm_perplexity",             # r4
    "doc_pii_redaction",             # r4
    "entity_pagerank",               # r4
    "embedding_top_component",       # r4
    "doc_boilerplate_spans",         # r5
    "doc_repetition_ratio",          # r5
    "doc_tfidf_top_terms",           # r5
    "doc_pack_assignments",          # r5
    "event_zorder_keys",             # r5
    "doc_stratified_sample",         # r5
    "embedding_pq_audit",            # r5
]
CHECKED_WINDOW = 50


def _registry():
    from flight_radar_pipeline_spark.plans import (  # noqa: F401
        battery,
        battery_corpus,
        battery_ext,
        battery_extras,
        battery_lake,
        battery_mining,
        battery_prep,
        battery_quality,
        battery_r7,
        battery_r7b,
        battery_r7c,
        battery_r7d,
        battery_r7e,
        battery_r7f,
        battery_r7g,
        battery_r7h,
        battery_r8,
        battery_r8b,
        battery_r8c,
        battery_r8d,
        battery_r8e,
        battery_r9,
        battery_r9b,
        battery_r9c,
        battery_r9d,
        battery_r10,
        battery_r10b,
        battery_r10c,
        battery_temporal,
        battery_text,
    )

    reg = battery.REGISTRY
    missing = [n for n in _WINDOW if n not in reg]
    if missing:
        raise RuntimeError(f"_WINDOW names absent from REGISTRY: {missing}")
    head = {n: reg[n] for n in _WINDOW}
    tail = {n: s for n, s in reg.items() if n not in head}
    return {**head, **tail}


# tail = everything outside the explicit window, in registration order
# (kept as a module attribute so tests can pin the composition)
def _tail_names():
    return [n for n in _registry() if n not in _WINDOW]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing_summary: scan→filter→hash-agg) at sf0.001."""
    REGISTRY = _registry()

    _configure(spark)
    return REGISTRY["pricing_summary"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    REGISTRY = _registry()

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return spec.build(spark, sf_dir)

        run.__name__ = spec.name
        return run

    return {name: wrap(spec) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    REGISTRY = _registry()

    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
