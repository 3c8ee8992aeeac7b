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
# Round-9 rotation — the standing pre-agreed rotation contract
# (tests/test_registry_order.py), composed exactly as the round-8 verdict
# directive 1 prescribed:
#   (a) the 20-entry round-8 POST_FREEZE slate (every oracled entry
#       registered after the round-8 window froze — none has ever held a
#       driver correctness row). A green round takes cumulative driver
#       coverage to ALL 272 oracled entries — the never-checked backlog
#       drains to zero for the first time.
#   (b) `pricing_summary` as the proven spine.
#   (c) the 4 MUST_BE_CHECKED only-coverage operators
#       (click_view_attribution / event_window_density /
#       event_value_percentiles / multimodal_features) — promised
#       "first in line for the round-9 window" two rounds running;
#       their last driver rows are CORRECTNESS_r06.
#   (d) 25 re-checks of the STALEST green rows: every oracled entry whose
#       last green driver row is r1 (4) or r3 (11), then the 10 oldest-of
#       the r4 cohort in registry order (deterministic tiebreak). Plans
#       are drift-audited (tools/audit_compare.py), but a driver-side
#       re-check of r1/r3-era rows is the cheapest possible insurance.
# 1 + 20 + 4 + 25 = 50 exactly.
#
# Demoted entries (the whole round-8 window minus the spine) all hold
# green rows in CORRECTNESS_r08.json; tests/test_battery.py's
# full-registry oracle sweep (ALL entries at sf0.001) remains the
# mandatory regression net for everything outside the window. Entries
# WITHOUT an oracle stay in the tail by policy (embedding_opq_audit +
# the approx-percentile twins + HLL + first-fit packing:
# non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # proven spine
    "pricing_summary",
    # (a) the round-8 POST_FREEZE slate, wholesale (20 — never driver-checked)
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
    # (c) the MUST_BE_CHECKED only-coverage operators (last rows: r06)
    "click_view_attribution",
    "event_window_density",
    "event_value_percentiles",
    "multimodal_features",
    # (d) 25 stalest-green re-checks (last green round in comment)
    "region_nation_rollup",          # r1
    "closed_sessions_stream",        # r1
    "hourly_event_counts_stream",    # r1
    "nations_with_customers",        # r1
    "customer_running_total",        # r3
    "hourly_event_counts",           # r3
    "doc_text_stats",                # r3
    "edit_distance_near_dup",        # r3
    "doc_simhash",                   # r3
    "top_bigrams_per_lang",          # r3
    "embedding_topk_lsh",            # r3
    "doc_token_classes",             # r3
    "doc_rolling_fingerprint",       # r3
    "doc_deterministic_sample",      # r3
    "event_value_anomalies",         # r3
    "revenue_by_nation",             # r4
    "shipping_priority",             # r4
    "order_priority_count",          # r4
    "top3_parts_per_brand",          # r4
    "user_click_view_gap",           # r4
    "latest_order_per_customer",     # r4
    "segment_set_ops",               # r4
    "customer_haversine",            # r4
    "event_props_json",              # r4
    "most_valuable_order",           # r4
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
