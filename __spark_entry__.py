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
# Round-13 rotation — the standing pre-agreed rotation contract
# (tests/test_registry_order.py), composed exactly as the round-12 verdict
# directive 1 prescribed:
#   (a) `pricing_summary` as the proven spine.
#   (b) the 3-entry round-12 POST_FREEZE slate (the only oracled entries
#       never driver-checked: the NB trainer, its stream twin, and the
#       Heaps'-law fit). A green round re-saturates cumulative driver
#       coverage at ALL 290 oracled entries.
#   (c) 46 re-checks of the STALEST green rows by (last green driver
#       round across CORRECTNESS_r01–r12, registry order): the remaining
#       r7 cohort (41 rows) plus the 5 oldest r8 rows. Plans are
#       drift-audited (tools/audit_compare.py), but a driver-side
#       re-check of r7/r8-era rows is the cheapest possible insurance.
# 1 + 3 + 46 = 50 exactly.
#
# Demoted entries (the whole round-12 window minus the spine) all hold
# green rows in CORRECTNESS_r12.json; tests/test_battery.py's
# full-registry oracle sweep (ALL entries at sf0.001) remains the
# mandatory regression net for everything outside the window. Entries
# WITHOUT an oracle stay in the tail by policy (embedding_opq_audit +
# the approx-percentile twins + HLL + first-fit packing:
# non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # (a) proven spine
    "pricing_summary",
    # (b) the round-12 POST_FREEZE slate, wholesale (3 — never driver-checked)
    "doc_nb_lang_classifier",
    "doc_nb_stream_train",
    "corpus_heaps_fit",
    # (c) 46 stalest-green re-checks (last green round in comment)
    "lineitem_weighted_median",           # r7
    "session_overlap_pairs",              # r7
    "user_event_type_unpivot",            # r7
    "user_value_holt",                    # r7
    "customer_adamic_adar",               # r7
    "doc_containment_pairs",              # r7
    "orders_cdc_apply",                   # r7
    "orders_pit_segment",                 # r7
    "customer_nearest_neighbor",          # r7
    "part_fs_match_weights",              # r7
    "doc_lang_kl_drift",                  # r7
    "customer_k_anonymity",               # r7
    "user_kmv_rolling_7d",                # r7
    "orders_cdc_stream_apply",            # r7
    "user_degree_powerlaw",               # r7
    "user_balance_clamped",               # r7
    "part_sorted_neighborhood_pairs",     # r7
    "doc_hybrid_rrf_search",              # r7
    "nation_revenue_share",               # r7
    "entity_reach_temporal",              # r7
    "event_value_stats_merged",           # r7
    "daily_type_rank_shift",              # r7
    "embedding_label_balance",            # r7
    "user_kmv_stream_partials",           # r7
    "rollup_restatement_diff",            # r7
    "orders_lineitem_join_ivm",           # r7
    "doc_fold_label_parity",              # r7
    "event_drift_stream_moments",         # r7
    "entity_min_cost_3hop",               # r7
    "event_value_hist_quantiles",         # r7
    "view_click_crosscorr",               # r7
    "event_value_cdf_norm",               # r7
    "part_revenue_abc",                   # r7
    "event_type_ks_drift",                # r7
    "nation_dp_customer_counts",          # r7
    "event_value_bootstrap_ci",           # r7
    "nation_month_revenue_growth",        # r7
    "ab_cuped_event_value",               # r7
    "cohort_cumulative_ltv",              # r7
    "event_hist_stream_quantiles",        # r7
    "orders_scd2_stream_merge",           # r7
    "embedding_topk_ivfpq_refined",       # r8
    "multimodal_jpeg_dims",               # r8
    "order_priority_chisq",               # r8
    "event_value_theil_sen",              # r8
    "nation_trade_balance",               # r8
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
        battery_r11,
        battery_r12,
        battery_r13,
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
