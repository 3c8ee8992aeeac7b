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
# Round-12 rotation — the standing pre-agreed rotation contract
# (tests/test_registry_order.py), composed exactly as the round-11 verdict
# directive 1 prescribed:
#   (a) `pricing_summary` as the proven spine.
#   (b) the 2-entry round-11 POST_FREEZE slate (the only oracled entries
#       never driver-checked). A green round takes cumulative driver
#       coverage to ALL 287 oracled entries — true full saturation.
#   (c) 47 re-checks of the STALEST green rows by (last green driver
#       round across CORRECTNESS_r01–r11, registry order) — the deepest
#       re-verification budget yet: the remaining r6 cohort (39 rows)
#       plus the 8 oldest r7 rows. Plans are drift-audited
#       (tools/audit_compare.py), but a driver-side re-check of
#       r6/r7-era rows is the cheapest possible insurance.
# 1 + 2 + 47 = 50 exactly.
#
# Demoted entries (the whole round-11 window minus the spine) all hold
# green rows in CORRECTNESS_r11.json; tests/test_battery.py's
# full-registry oracle sweep (ALL entries at sf0.001) remains the
# mandatory regression net for everything outside the window. Entries
# WITHOUT an oracle stay in the tail by policy (embedding_opq_audit +
# the approx-percentile twins + HLL + first-fit packing:
# non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # (a) proven spine
    "pricing_summary",
    # (b) the round-11 POST_FREEZE slate, wholesale (2 — never driver-checked)
    "event_type_bradley_terry",
    "event_type_policy_replay",
    # (c) 47 stalest-green re-checks (last green round in comment)
    "corpus_filter_funnel",               # r6
    "corpus_training_manifest",           # r6
    "multimodal_image_dims",              # r6
    "event_value_interpolated",           # r6
    "event_value_winsorized",             # r6
    "user_value_ewma",                    # r6
    "order_status_psi_drift",             # r6
    "session_event_type_lift",            # r6
    "event_hourly_mean_shift",            # r6
    "distinct_user_event_types_within_wm_stream",  # r6
    "ab_test_event_value",                # r6
    "top_session_paths",                  # r6
    "user_value_twap",                    # r6
    "event_type_hour_mutual_info",        # r6
    "top_users_stream",                   # r6
    "event_props_variant",                # r6
    "shipping_latency_sla",               # r6
    "referential_integrity_audit",        # r6
    "user_erasure_audit",                 # r6
    "nation_revenue_view_ivm",            # r6
    "daily_rollup_stream_merge",          # r6
    "orders_table_checksum",              # r6
    "orders_customer_key_overlap_kmv",    # r6
    "orders_schema_evolution",            # r6
    "part_brand_cooccurrence",            # r6
    "order_benford_digits",               # r6
    "event_value_lag_autocorr",           # r6
    "event_seasonal_baseline",            # r6
    "part_name_fuzzy_pairs",              # r6
    "doc_word_spans_udtf",                # r6
    "view_click_full_outer_stream",       # r6
    "order_gap_survival",                 # r6
    "customer_revenue_gini",              # r6
    "peak_concurrent_sessions",           # r6
    "embedding_group_centroids",          # r6
    "embedding_cosine_histogram",         # r6
    "event_value_woe_bins",               # r6
    "customer_rfm_segments",              # r6
    "purchase_multitouch_attribution",    # r6
    "embedding_mutual_nn",                # r7
    "embedding_topk_ivfpq",               # r7
    "multimodal_audio_meta",              # r7
    "multimodal_video_meta",              # r7
    "customer_geo_cell_pairs",            # r7
    "entity_reach_3hop",                  # r7
    "event_decayed_type_scores",          # r7
    "doc_char_class_entropy",             # r7
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
