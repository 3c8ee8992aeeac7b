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
# Round-6 rotation — same policy that closed the r5 gap: the 42-entry
# POST_FREEZE slate (every oracled entry registered after the round-5
# window froze — none has ever held a driver correctness row) moves into
# the window WHOLESALE, exactly as pre-agreed in the round-5
# tests/test_registry_order.py::POST_FREEZE. The other 8 slots:
#
# - a 5-entry proven spine: the flagship (pricing_summary) and the
#   only-coverage operators pinned by tests/test_registry_order.py
#   (as-of join, range join, exact percentiles, multimodal decode);
# - the 3 round-6 additions/reworks, each needing its first driver row
#   under its new shape: multimodal_image_dims (native PNG/GIF header
#   parsing), corpus_training_manifest (the end-to-end corpus-assembly
#   composition), and embedding_near_dup_pairs (now SELF-SIZING its LSH
#   planes from the corpus count — the round-5 scale-killer fix).
#
# Demoted entries (the whole round-5 window minus the spine) all hold
# green rows in CORRECTNESS_r05.json; tests/test_battery.py's
# full-registry oracle sweep (ALL entries at sf0.001) remains the
# mandatory regression net for everything outside the window. Entries
# WITHOUT an oracle stay in the tail by policy (embedding_opq_audit +
# the approx-percentile twins + HLL + first-fit packing:
# non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # proven spine
    "pricing_summary",
    "click_view_attribution",
    "event_window_density",
    "event_value_percentiles",
    "multimodal_features",
    # round-6 additions / reworked entries (first driver row each)
    "multimodal_image_dims",
    "corpus_training_manifest",
    "embedding_near_dup_pairs",
    # the round-5 POST_FREEZE slate, wholesale (42 — never driver-checked)
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
