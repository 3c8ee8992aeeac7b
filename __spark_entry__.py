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
# Round-11 rotation — the standing pre-agreed rotation contract
# (tests/test_registry_order.py), composed exactly as the round-10 verdict
# directive 1 prescribed:
#   (a) `pricing_summary` as the proven spine.
#   (b) the 5-entry round-10 POST_FREEZE slate (every oracled entry
#       registered after the round-10 window froze — none has ever held
#       a driver correctness row). A green round takes cumulative driver
#       coverage to ALL 285 oracled entries — full saturation for the
#       first time.
#   (c) 44 re-checks of the STALEST green rows by (last green driver
#       round across CORRECTNESS_r01–r10, registry order) — the deepest
#       re-verification budget yet: the remaining r5 cohort (38 rows)
#       plus the 6 oldest r6 rows. Plans are drift-audited
#       (tools/audit_compare.py), but a driver-side re-check of
#       r5/r6-era rows is the cheapest possible insurance.
# 1 + 5 + 44 = 50 exactly.
#
# Demoted entries (the whole round-10 window minus the spine) all hold
# green rows in CORRECTNESS_r10.json; tests/test_battery.py's
# full-registry oracle sweep (ALL entries at sf0.001) remains the
# mandatory regression net for everything outside the window. Entries
# WITHOUT an oracle stay in the tail by policy (embedding_opq_audit +
# the approx-percentile twins + HLL + first-fit packing:
# non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # (a) proven spine
    "pricing_summary",
    # (b) the round-10 POST_FREEZE slate, wholesale (5 — never driver-checked)
    "nation_seat_apportionment",
    "part_price_size_skyline",
    "order_price_stump_split",
    "event_score_isotonic_fit",
    "nation_profile_mst",
    # (c) 44 stalest-green re-checks (last green round in comment)
    "doc_bpe_merges",                     # r5
    "closed_sessions_stream_native",      # r5
    "distinct_user_event_types_stream",   # r5
    "incremental_daily_rollup",           # r5
    "customer_weighted_price_udaf",       # r5
    "multimodal_modality_route",          # r5
    "user_kmv_distinct",                  # r5
    "hopping_event_counts",               # r5
    "nation_year_widget_revenue",         # r5
    "status_month_grouping_sets",         # r5
    "event_type_transitions",             # r5
    "event_value_hourly_trend",           # r5
    "view_click_left_outer_stream",       # r5
    "orders_scd1_stream_merge",           # r5
    "doc_decontamination",                # r5
    "doc_chunk_windows",                  # r5
    "doc_weighted_sample",                # r5
    "doc_oov_rate",                       # r5
    "corpus_mixture_sample",              # r5
    "doc_length_histogram",               # r5
    "embedding_dim_stats",                # r5
    "doc_token_ids",                      # r5
    "near_dup_triangles",                 # r5
    "multimodal_frame_sample",            # r5
    "event_value_mad_outliers",           # r5
    "embedding_int8_quant",               # r5
    "event_key_skew_report",              # r5
    "doc_incremental_dedup",              # r5
    "signup_click_purchase_funnel",       # r5
    "doc_contiguous_ids",                 # r5
    "event_value_zscore",                 # r5
    "order_price_deciles",                # r5
    "table_quality_report",               # r5
    "user_count_cms_estimates",           # r5
    "enriched_events_stream",             # r5
    "doc_dedup_decisions",                # r5
    "doc_chunk_dedup_rate",               # r5
    "doc_keep_best_dedup",                # r5
    "doc_heavy_hitters",                  # r6
    "doc_source_report",                  # r6
    "doc_hashing_tf",                     # r6
    "doc_topic_clusters",                 # r6
    "embedding_near_dup_pairs",           # r6
    "doc_bpe_encode",                     # r6
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
