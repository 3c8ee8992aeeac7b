"""Driver-battery oracle parity at sf0.001 — local mirror of the t2 gate.

Every REGISTRY query with an oracle runs on the smallest synthetic tables
and must hash-match its DuckDB SQL; queries without an oracle must at
least build and return a stable schema.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from oracle import compare

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.battery_sweep
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_battery_query(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    try:
        if name in ORACLES:
            compare(df, ORACLES[name], duck)
        else:
            assert df.count() >= 0 and len(df.schema.fields) > 0
    finally:
        # several operators persist an intermediate (LSH signatures,
        # shingle sets) released via operators.lifecycle at the consumer;
        # the sweep keeps the blanket session cache clear as
        # belt-and-braces, same as bench.py — entries are independent so
        # nothing useful is lost
        spark.catalog.clearCache()


# order-sensitive shapes (top-k windows, sorted collects, as-of carry,
# LSH candidate generation): identical output under different shuffle
# widths or the determinism claim is hollow
@pytest.mark.parametrize(
    "name",
    [
        "top3_parts_per_brand",
        "latest_order_per_customer",
        "click_view_attribution",
        "minhash_near_dup_pairs",
        "embedding_kmeans_clusters",
        "snapshot_diff",
        "doc_boilerplate_spans",
        "top_session_paths",
        "orders_table_checksum",
        # round-7 order-sensitive additions: greedy re-ranking, hash-ranked
        # negative sampling, two ranked ANN lists folded positionally, and
        # integer path-count ranking
        "embedding_mmr_topk",
        "embedding_contrastive_triplets",
        "embedding_ann_ndcg",
        "entity_hits_scores",
        # round-8 order-sensitive additions: min-id component labels with
        # border argmin attachment, survivorship argmax rules over CC
        # entities, two rank windows folded into a top-k overlap, ntile /
        # nth_value frame semantics, and the CUSUM argmax-with-tiebreak
        "customer_geo_dbscan",
        "part_golden_records",
        "embedding_jl_distortion",
        "orders_window_builtins",
        "event_value_cusum_changepoint",
        # round-9 order-sensitive additions: argmax-with-struct-min-argmin
        # (Kadane), ranked 80%-threshold head (Pareto), greedy per-step
        # argmin-tiebreak collect (set cover), day-sorted sequential fold
        # (EWMA), and the PH first-alarm min-over-ordered-days
        "customer_kadane_window",
        "customer_pareto_vital_few",
        "supplier_part_coverage",
        "event_value_ewma_bands",
        "event_value_page_hinkley",
        # round-10: the range-partitioned exact-W₁ CDF rewrite — global
        # running sums must be identical for any bucket/shuffle layout
        "event_value_wasserstein_drift",
        # round-10: every other global-ordered running sum/rank moved to
        # the same bucket-partials device — same invariance obligation
        "event_value_mann_whitney",
        "event_type_kruskal_wallis",
        "event_value_runs_test",
        "event_score_ks_separation",
        "peak_concurrent_sessions",
        "customer_revenue_gini",
        "part_revenue_abc",
        # round-10 new entries: ranked remainders + running-max frontier
        "nation_seat_apportionment",
        "part_price_size_skyline",
        # round-10b new entries: ranged running class counts + argmax
        # struct (stump); driver PAVA from a collected grid (isotonic)
        "order_price_stump_split",
        "event_score_isotonic_fit",
        # round-10c: Kruskal pick sequence from a collected bounded grid
        "nation_profile_mst",
        # round-11: MM iterations from a collected bounded duel grid
        # (Bradley-Terry); greedy-argmax policy + replay estimator
        "event_type_bradley_terry",
        "event_type_policy_replay",
        # round-12: integer-score argmax over per-doc sums (NB — the
        # micro-nat quantization exists precisely so widths can't move
        # an argmax); cumulative checkpoint sums into a log-log OLS
        "doc_nb_lang_classifier",
        "corpus_heaps_fit",
    ],
)
def test_battery_partition_determinism(name, spark):
    # shared materializations would satisfy this vacuously (both widths
    # reusing one cached result): clear the pair table AND the trained
    # k-means centroids so each width recomputes from scratch
    from flight_radar_pipeline_spark.plans.battery_corpus import (
        clear_kmeans_cache,
    )
    from flight_radar_pipeline_spark.plans.battery_text import clear_pair_cache

    def clear_caches():
        clear_pair_cache()
        clear_kmeans_cache()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        clear_caches()
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
        clear_caches()
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        many = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        clear_caches()
    assert one == many
