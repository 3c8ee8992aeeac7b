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
# Round-5 rotation — close the never-driver-checked gap in one pass: the
# 43 oracled entries that have never held a driver correctness row in
# CORRECTNESS_r01-r04 ALL move into the window (round-4/5 additions like
# the KMV sketch, hopping windows, PQ-era quantization audits, GROUPING
# SETS, Markov transitions, modality routing, vocab encoding, BPE merges,
# native session windows, keep-best dedup, per-group OLS, stream-merge
# SCD1 — plus every round-3 corpus/prep extension that had only
# local-sweep coverage: decontamination, chunking, weighted/mixture/
# stratified sampling, OOV, packing, z-order keys, dim stats, CMS grid,
# skew report, MAD outliers, funnel, triangles, ...). The other 7 slots
# are a proven spine: the flagship (pricing_summary), the only-coverage
# operators pinned by tests/test_registry_order.py (as-of join, range
# join, exact percentiles, multimodal decode), one deep-join anchor
# (revenue_by_nation) and one dedup anchor (minhash_near_dup_pairs).
#
# Entries ADDED during round 5 AFTER this window froze (winsorize, EWMA,
# boilerplate spans, source report, filter funnel, group centroids,
# RI/erasure audits, WOE, PSI, lift, IVM, mean shift, within-watermark
# dedup, multi-touch attribution, A/B, paths, rollup-stream, hashing-TF,
# TWAP, MI, cosine histogram, checksum, KMV overlap, leaderboard, topic
# clusters, RFM, variant, schema evolution — plus the late-round wave:
# association rules, Benford, autocorrelation, seasonal backtest, fuzzy
# linkage, UDTF spans, stream full-outer, Kaplan-Meier, Gini, peak
# concurrency) are tail by policy — enumerated in
# tests/test_registry_order.py::POST_FREEZE as the round-6 rotation
# slate (43 entries ≈ a full window: round 6 can rotate the slate in
# wholesale, keeping the same proven-spine pattern); every one is
# locally oracle-checked by the full sweep.
#
# Demoted entries all held green driver rows in r1-r4 (see
# CORRECTNESS_r0*.json) and/or are shape-siblings of window members;
# tests/test_battery.py's full-registry oracle sweep (ALL entries at
# sf0.001) remains the mandatory regression net for everything outside
# the window. Entries WITHOUT an oracle stay in the tail by policy
# (embedding_opq_audit + the approx-percentile twins + HLL + first-fit
# packing: non-SQL-expressible; each pinned by a dedicated local test —
# tests/test_opq.py, test_approx_percentile.py, test_hll_accuracy.py).
_WINDOW = [
    # proven spine (revenue_by_nation / minhash_near_dup_pairs rotated OUT
    # mid-round-5 — both held green rows in r1-r4 and their shapes stay
    # window-covered by nation_year_widget_revenue / doc_dedup_decisions —
    # in favor of the two most novel round-5 additions: the left-outer
    # stream-stream join and exact-substring boilerplate mining)
    "pricing_summary",
    "view_click_left_outer_stream",
    "doc_boilerplate_spans",
    "click_view_attribution",
    "event_window_density",
    "event_value_percentiles",
    "multimodal_features",
    # never driver-checked until round 5 (43 = every oracled entry with
    # no green row in CORRECTNESS_r01-r04)
    "doc_bpe_merges",
    "closed_sessions_stream_native",
    "event_value_hourly_trend",
    "doc_keep_best_dedup",
    "customer_weighted_price_udaf",
    "doc_repetition_ratio",
    "doc_tfidf_top_terms",
    "doc_pack_assignments",
    "doc_stratified_sample",
    "distinct_user_event_types_stream",
    "event_zorder_keys",
    "incremental_daily_rollup",
    "doc_decontamination",
    "doc_chunk_windows",
    "doc_weighted_sample",
    "doc_oov_rate",
    "corpus_mixture_sample",
    "doc_length_histogram",
    "embedding_dim_stats",
    "doc_chunk_dedup_rate",
    "doc_dedup_decisions",
    "table_quality_report",
    "user_count_cms_estimates",
    "enriched_events_stream",
    "doc_contiguous_ids",
    "event_value_zscore",
    "order_price_deciles",
    "doc_incremental_dedup",
    "signup_click_purchase_funnel",
    "embedding_int8_quant",
    "event_key_skew_report",
    "multimodal_frame_sample",
    "event_value_mad_outliers",
    "near_dup_triangles",
    "orders_scd1_stream_merge",
    "multimodal_modality_route",
    "doc_token_ids",
    "user_kmv_distinct",
    "hopping_event_counts",
    "nation_year_widget_revenue",
    "embedding_pq_audit",
    "status_month_grouping_sets",
    "event_type_transitions",
]
CHECKED_WINDOW = 50


def _registry():
    from flight_radar_pipeline_spark.plans import (  # noqa: F401
        battery,
        battery_corpus,
        battery_ext,
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
