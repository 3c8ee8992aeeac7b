"""Scale-up measurement: the expensive families at sf0.1 vs synthetic sf1.

Runs the dedup / ANN / graph / streaming battery entries at BOTH scale
factors in one session (same machine conditions → trustworthy ratios),
warm-of-2 timing like bench.py, and prints a JSON report to stdout plus
a markdown table for BASELINE.md.

Two extra non-battery measurements confirm the documented semantic-dedup
posture "k must grow with the corpus": the in-cell quadratic verify is
O(n²/k), so a 10× corpus at FIXED k pays ~10× more verify work per row,
while k grown 10× keeps per-row work flat. Both variants run at sf1.

Usage: python tools/scale_run.py [sf01_dir] [sf1_dir]
       python tools/scale_run.py --extras [sf01_dir] [sf1_dir]
         (times only EXTRA_FAMILIES — the round-6 operator additions —
          and MERGES them into SCALE_RUN.json under r6_-prefixed keys,
          like the r5_* records)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from flight_radar_pipeline_spark.session import get_spark_session

FAMILIES = [
    # dedup
    "doc_exact_dedup",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    "ngram_jaccard_pairs",
    "near_dup_clusters",
    "doc_dedup_decisions",
    # embeddings / ANN
    "embedding_near_dup_pairs",
    "embedding_cosine_histogram",
    "embedding_topk_bruteforce",
    "embedding_topk_ivf",
    "embedding_kmeans_clusters",
    "embedding_semantic_dedup",
    "embedding_pq_audit",
    "embedding_dim_stats",
    # graph
    "entity_pagerank",
    # temporal / streaming
    "signup_click_purchase_funnel",
    "enriched_events_stream",
    "closed_sessions_stream",
    "closed_sessions_stream_native",
    "click_view_pairs_stream",
]

# round-6 additions, measured separately (--extras) and appended as r6_*
EXTRA_FAMILIES = [
    "customer_geo_cell_pairs",      # output is density-quadratic by physics
    "customer_nearest_neighbor",
    "session_overlap_pairs",        # output is concurrency-quadratic
    "entity_reach_3hop",
    "customer_adamic_adar",         # maxdf cap bounds cost as items heat up
    "doc_containment_pairs",
    "user_kmv_rolling_7d",
    "doc_hybrid_rrf_search",
    "doc_lang_kl_drift",
    "user_balance_clamped",
    "orders_cdc_apply",
    "orders_pit_segment",
    "entity_reach_temporal",
    "event_value_stats_merged",
    "daily_type_rank_shift",
    "part_fs_match_weights",
    "nation_revenue_share",
    "rollup_restatement_diff",
    "entity_min_cost_3hop",         # weighted Bellman-Ford, frontier-bounded
    "event_value_hist_quantiles",   # state is nbins longs/group at any sf
    "view_click_crosscorr",         # window over O(hours), not the fact
    "embedding_mutual_nn",          # self-sized LSH → flat bucket occupancy
    "event_value_cdf_norm",         # broadcast 50-bin CDF; fact side row-local
    "part_revenue_abc",             # window over the |parts| pre-aggregate
    "event_type_ks_drift",          # |types|²×50 pre-aggregate compare
    "nation_dp_customer_counts",    # one groupBy + row-local noise
    "event_value_bootstrap_ci",     # ×B row-local explode, (type,b) agg
    "multimodal_audio_meta",        # 44-byte header slice per row
    "multimodal_video_meta",        # 56-byte header slice per row
    "nation_month_revenue_growth",  # lag over |nations|×|months| pre-agg
    "ab_cuped_event_value",         # one user-level shuffle + 1-row theta
    "embedding_topk_ivfpq",         # routing + literal-lookup reconstruction
]

# round-7 additions, measured separately (--extras-r7), appended as r7_*
EXTRA_FAMILIES_R7 = [
    "multimodal_jpeg_dims",         # bounded marker walk over a 512-B slice
    "embedding_topk_ivfpq_refined", # ADC shortlist + exact rescore on R rows
    "order_priority_chisq",         # |priorities|×|statuses| contingency agg
    "event_value_theil_sen",        # hour-bucket pre-agg → bounded pair set
    "nation_trade_balance",         # two fact aggs + broadcast nation join
    "orders_backfill_gap_audit",    # month-spine anti-join over a pre-agg
    "event_value_spearman",         # two rank windows over an hourly pre-agg
    "event_session_bounce",         # per-session count agg → session grain
    "embedding_ivf_cell_balance",   # cell-count agg over IVF assignments
    "orders_scd3_merge",            # keyed window over (key, version)
    "embedding_matryoshka_audit",   # 10-query broadcast vs truncated dims
    "customer_l_diversity",         # distinct-count agg per quasi-id group
    "corpus_zipf_fit",              # top-V vocab agg + closed-form OLS
    "event_type_burstiness",        # (type, hour) pre-agg → Fano per type
    "orders_scd3_stream_merge",     # foreachBatch versioned merge (stream)
    "event_value_mann_whitney",     # rank window over the distinct-value pre-agg
    "event_type_kruskal_wallis",    # same + one fact-grain broadcast join
    "customer_t_closeness",         # (nation, band, seg)-grain aggs
    "doc_dsir_importance",          # 64-bucket hashed-feature aggs
    "doc_lang_temperature_sample",  # |langs| count agg + conditional count
    "embedding_mmr_topk",           # shortlist-bounded greedy, checkpointed
    "brand_discount_elasticity",    # broadcast dim join + |brands| agg
    "user_growth_accounting",       # (user, day)-grain windows
    "doc_readability",              # scan-speed column exprs + |langs| agg
    "event_type_bh_fdr",            # windows over the m-row test table
    "event_value_conformal",        # distinct-residual cumulative window
    "part_soundex_blocks",          # vocabulary-grain pair join
    "entity_hits_scores",           # bigint path-count iterations
    "doc_domain_classifier_gd",     # checkpointed features, 3-sum GD steps
    "event_hourly_stl_decompose",   # windows on the |hours| pre-agg
    "lineitem_mahalanobis_outliers",  # decimal-exact stats, row-local d2
    "event_type_markov_stationary",  # |types|^2 matrix power iteration
    "embedding_ann_ndcg",           # two ANN lists + 2k|queries|-row fold
    "nation_supplier_concentration",  # one fact agg to (nation, supp) grain
    "user_growth_stream_ledger",    # foreachBatch state + ledger (stream)
    "doc_bpe_fertility",            # vocab-grain BPE + word-keyed join
    "doc_span_corruption_plan",     # row-local position hash + doc windows
    "doc_ngram_novelty",            # distinct-gram agg + gram-keyed join
    "embedding_contrastive_triplets",  # 32-anchor broadcast scan
    "user_type_entropy_profile",    # (user, day, type)-grain aggs
    "entity_kcore_peeling",         # shrinking per-round degree aggs
    "doc_proximity_search",         # two-term posting-list join
    "signup_purchase_latency_quantiles",  # distinct-minute cumulative window
    "brand_simpson_check",          # same decimal sums as elasticity
    "event_value_runs_test",        # per-user lag window + 1-row moments
    "event_hourly_harmonic_fit",    # |hours| pre-agg, closed-form fit
    "doc_shingle_diversity",        # row-local array exprs
    "ab_sprt_daily_decision",       # |days| cumulative walk
    "order_interarrival_fit",       # per-customer lag + distinct-gap CDF
]


def _clear_shared_caches() -> None:
    from flight_radar_pipeline_spark.plans.battery_corpus import clear_kmeans_cache
    from flight_radar_pipeline_spark.plans.battery_text import clear_pair_cache

    clear_pair_cache()
    clear_kmeans_cache()


def _warm_of_2(one_run) -> tuple[float, float]:
    cold = one_run()
    if cold < 0:
        return cold, cold
    warm = one_run()
    if warm > cold:
        retry = one_run()
        if 0 <= retry < warm:
            warm = retry
        warm = min(warm, cold)
    return cold, warm


def _time_query(spark, fn, sf_dir: str) -> tuple[float, float]:
    def one_run() -> float:
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record, don't abort
            print(f"# scale_run error: {type(exc).__name__}: {exc}", file=sys.stderr)
            return -1.0

    out = _warm_of_2(one_run)
    spark.catalog.clearCache()
    return out


def _semantic_dedup_at_k(spark, sf_dir: str, k: int):
    """Direct operator call (not the oracle-pinned battery entry) so k can
    scale with the corpus: centroids trained at k, then cell-quadratic
    dedup decisions."""
    from flight_radar_pipeline_spark.operators import similarity as S
    from flight_radar_pipeline_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n_dims = 64
    cents = S.kmeans_centroids(emb, k=k, iters=3, n_dims=n_dims, seed="scale")
    return S.semantic_dedup_decisions(emb, cents, threshold=0.35)


# round-8 additions, measured separately (--extras-r8), appended as r8_*
EXTRA_FAMILIES_R8 = [
    "user_sessions_capped",           # per-user sorted-array fold, one shuffle
    "lineitem_benford_second_digit",  # one scan, 10-row agg
    "event_score_calibration",        # one scan, 10-bin agg
    "doc_mixture_reweight",           # |langs| agg + driver softmax tilt
    "orders_window_builtins",         # one window shuffle on o_custkey
    "event_value_irls_logistic",      # 3 Newton 5-sum passes, checkpointed z
    "event_hour_pinball_p90",         # 12 subgradient 2-avg passes
    "customer_geo_dbscan",            # grid pair join + CC on cores (self-sized min_pts)
    "part_golden_records",            # blocked FS pairs + CC + survivorship agg
    "multimodal_bmp_decode",          # Arrow synth + decode, linear in pixels
    "event_value_cusum_changepoint",  # (type, day) pre-agg + |days| windows
    "embedding_jl_distortion",        # one-scan projection + 8-query audit
    "event_value_psi_drift",          # one scan + 10-bin spine
    "event_score_ks_separation",      # distinct-score grain windows
    "doc_mixture_schedule",           # two rank windows, |lang| partitions
    "event_cusum_stream_ledger",      # 3-batch foreachBatch partial merge
    "nation_order_jackknife",         # |nations| partials, fact scanned once
    "event_hourly_haar_energy",       # 9 pairwise levels on a 512-row spine
    "ab_power_mde",                   # one 5-sum aggregate
    "event_value_wasserstein_drift",  # distinct-value grain windows
]


# round-12 refresh (--extras-r12, appended as r12_*): every entry whose
# plan changed AFTER its newest SCALE_RUN row (verdict item 6) — the bpe
# single-vocabulary persist, the policy-replay / basket-lift exchange
# compressions, the r11 RI-audit one-scan rewrite and concurrency-sweep
# explode, and the four rank-device faces that gained probe-reuse
# checkpoints in r11 after their r10_ rows were recorded.
EXTRA_FAMILIES_R12 = [
    "doc_bpe_encode",
    "doc_bpe_fertility",
    "event_type_policy_replay",
    "session_event_type_lift",
    "referential_integrity_audit",
    "peak_concurrent_sessions",
    "event_value_mann_whitney",
    "event_type_kruskal_wallis",
    "event_value_runs_test",
    "event_score_ks_separation",
    # the round-12 POST_FREEZE additions (measured on registration)
    "doc_nb_lang_classifier",
    "corpus_heaps_fit",
    "doc_nb_stream_train",
]

# round-13 refresh (--extras-r13, appended as r13_*): every entry whose
# plan changed after its newest SCALE_RUN row — the two array-combinations
# exchange compressions (self-join → bounded per-item set explode) and
# the NB stream twin's move to the delta fold.
EXTRA_FAMILIES_R13 = [
    "customer_adamic_adar",
    "doc_containment_pairs",
    "doc_nb_stream_train",
    # the round-13 POST_FREEZE additions (measured on registration)
    "doc_duplicated_coverage",
    "doc_nb_margin_calibration",
    # the lambda-CSE hoist fix (lower(text) out of the transform lambda)
    "doc_shingle_diversity",
    # the single-pass triplets rewrite (one scored scan, two shared-key windows)
    "embedding_contrastive_triplets",
    # third round-13 POST_FREEZE addition (measured on registration)
    "doc_nb_unlearn_erasure",
    # fourth round-13 POST_FREEZE addition (measured on registration)
    "doc_coverage_stream_index",
    # round-13 OPTIMIZATION session 4 plan changes (OPTIMIZATION_r13.md
    # #16-#21): fact-side pre-aggregation, single-pass novelty window,
    # gram-array hoist, driver-greedy MMR, one-job wave staging
    # (event_psi_stream_ledger refreshed as the staged-replay
    # representative)
    "referential_integrity_audit",
    "doc_ngram_novelty",
    "doc_repetition_ratio",
    "embedding_mmr_topk",
    "event_psi_stream_ledger",
]

# round-14 refresh (--extras-r14, appended as r14_*): every entry whose
# plan changed this optimization round — the single-action HITS build
# with literal totals, the codegen'd adamic-adar pair Generates, the
# checkpointed conformal residual grid, the five materialize_input
# flips of the ranged-cumulative device, the manifest quality-gate
# commute, and the RAM-scratch stream staging (psi ledger + nb stream
# as the replay representatives).
EXTRA_FAMILIES_R14 = [
    "entity_hits_scores",
    "customer_adamic_adar",
    "event_value_conformal",
    "order_price_stump_split",
    "part_revenue_abc",
    "part_price_size_skyline",
    "event_wasserstein_stream_ledger",
    "customer_revenue_gini",
    "corpus_training_manifest",
    "embedding_mmr_topk",
    "event_psi_stream_ledger",
    "doc_nb_stream_train",
]

# round-9 additions, measured separately (--extras-r9), appended as r9_*
EXTRA_FAMILIES_R10 = [
    # the two new round-10 families
    "nation_seat_apportionment",      # fact agg + |nations| windows
    "part_price_size_skyline",        # per-price grid + ranged running max
    # the two round-10b families
    "order_price_stump_split",        # threshold grid + ranged class counts
    "event_score_isotonic_fit",       # 20-bin grid + driver PAVA
    # round-10c
    "nation_profile_mst",             # fact agg to 25 nodes + driver Kruskal
    # the ranged-prefix-sum refits (directive-2 sweep) — re-measured so
    # the constant-overhead adjudication in BASELINE.md has r10 ratios
    "event_value_wasserstein_drift",
    "event_wasserstein_stream_ledger",
    "event_value_mann_whitney",
    "event_type_kruskal_wallis",
    "event_value_runs_test",
    "event_score_ks_separation",
    "peak_concurrent_sessions",
    "customer_revenue_gini",
    "part_revenue_abc",
    # the exchange-compression rewrites (directive 4)
    "event_value_conformal",
    "event_type_markov_stationary",
    "user_erasure_audit",
    "nation_order_jackknife",
    "event_value_psi_drift",
]

EXTRA_FAMILIES_R9 = [
    "user_hll_sparse_audit",          # exploded 2x scan, 64-register agg
    "event_psi_stream_ledger",        # 3-batch foreachBatch count merge
    "event_wasserstein_stream_ledger",  # 3-batch (value, period) ledger
    "event_value_page_hinkley",       # (type, day) pre-agg + window chain
    "supplier_part_coverage",         # 5 greedy anti-join + agg steps
    "customer_kadane_window",         # (nation, day) agg + prefix windows
    "event_value_ewma_bands",         # per-type fold over |days| array
    "customer_pareto_vital_few",      # per-nation ranked window
]


def run_extras(sf01: str, sf1: str, only: set[str] | None = None,
               families: list[str] | None = None, prefix: str = "r6_") -> int:
    """Time an extras family list at both SFs, merge into SCALE_RUN.json."""
    spark = get_spark_session(app_name="frp-scale-extras", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    queries = entrymod.queries()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "SCALE_RUN.json")
    report = json.load(open(out_path)) if os.path.exists(out_path) else {}
    for name in (families if families is not None else EXTRA_FAMILIES):
        if only is not None and name not in only:
            continue
        fn = queries[name]
        _clear_shared_caches()
        c01, w01 = _time_query(spark, fn, sf01)
        _clear_shared_caches()
        c1, w1 = _time_query(spark, fn, sf1)
        ratio = round(w1 / w01, 2) if w01 > 0 and w1 >= 0 else None
        report[f"{prefix}{name}"] = {
            "sf0.1_warm": w01, "sf1_warm": w1,
            "sf0.1_cold": c01, "sf1_cold": c1, "ratio": ratio,
        }
        print(f"{name}: sf0.1 {w01}s  sf1 {w1}s  ratio {ratio}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] in (
        "--extras", "--extras-r7", "--extras-r8", "--extras-r9",
        "--extras-r10", "--extras-r12", "--extras-r13", "--extras-r14",
    ):
        sf01 = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        sf1 = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scratch/sf1"
        only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
        if sys.argv[1] == "--extras-r7":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R7, prefix="r7_")
        if sys.argv[1] == "--extras-r8":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R8, prefix="r8_")
        if sys.argv[1] == "--extras-r9":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R9, prefix="r9_")
        if sys.argv[1] == "--extras-r10":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R10, prefix="r10_")
        if sys.argv[1] == "--extras-r12":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R12, prefix="r12_")
        if sys.argv[1] == "--extras-r13":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R13, prefix="r13_")
        if sys.argv[1] == "--extras-r14":
            return run_extras(sf01, sf1, only,
                              families=EXTRA_FAMILIES_R14, prefix="r14_")
        return run_extras(sf01, sf1, only)
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    spark = get_spark_session(app_name="frp-scale-run", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    queries = entrymod.queries()
    report: dict[str, dict] = {}
    for name in FAMILIES:
        fn = queries[name]
        _clear_shared_caches()
        c01, w01 = _time_query(spark, fn, sf01)
        _clear_shared_caches()
        c1, w1 = _time_query(spark, fn, sf1)
        ratio = round(w1 / w01, 2) if w01 > 0 and w1 >= 0 else None
        report[name] = {
            "sf0.1_warm": w01,
            "sf1_warm": w1,
            "sf0.1_cold": c01,
            "sf1_cold": c1,
            "ratio": ratio,
        }
        print(f"{name}: sf0.1 {w01}s  sf1 {w1}s  ratio {ratio}", flush=True)

    # sign-LSH plane-scaling confirmation at sf1 (10× corpus): the battery
    # entry's 4 tables × 4 planes keeps bucket occupancy ∝ corpus, so the
    # in-bucket verify grows super-linearly; growing planes_per_table by
    # ~log2(10) ≈ 3 restores flat occupancy. Both variants run at sf1.
    def _lsh_at(planes: int):
        from flight_radar_pipeline_spark.operators import similarity as S
        from flight_radar_pipeline_spark.sources.readers import load_table

        emb = load_table(spark, sf1, "embeddings")
        return S.cosine_near_dup_pairs(
            emb, threshold=0.35, num_tables=4, planes_per_table=planes,
            n_dims=64,
        )

    for label, planes in (("cosine_lsh_sf1_fixed_p4", 4),
                          ("cosine_lsh_sf1_scaled_p7", 7)):
        def one_run(planes=planes) -> float:
            t0 = time.perf_counter()
            try:
                _lsh_at(planes).write.format("noop").mode(
                    "overwrite"
                ).save()
                return round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                print(f"# scale_run error {label}: {exc}", file=sys.stderr)
                return -1.0

        cold, warm = _warm_of_2(one_run)
        spark.catalog.clearCache()
        report[label] = {"sf1_warm": warm, "sf1_cold": cold}
        print(f"{label}: warm {warm}s cold {cold}s", flush=True)

    # semantic-dedup k-scaling confirmation at sf1 (10× corpus):
    # fixed k=8 (battery parity) vs k=80 (k grown with corpus)
    for label, k in (("semantic_dedup_sf1_fixed_k8", 8),
                     ("semantic_dedup_sf1_scaled_k80", 80)):
        def one_run(k=k) -> float:
            t0 = time.perf_counter()
            try:
                _semantic_dedup_at_k(spark, sf1, k).write.format("noop").mode(
                    "overwrite"
                ).save()
                return round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                print(f"# scale_run error {label}: {exc}", file=sys.stderr)
                return -1.0

        cold, warm = _warm_of_2(one_run)
        spark.catalog.clearCache()
        report[label] = {"sf1_warm": warm, "sf1_cold": cold}
        print(f"{label}: warm {warm}s cold {cold}s", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", ".scratch", "SCALE_RUN.json")
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"scale_run": report}, separators=(",", ":"))[:4000])

    # markdown table for BASELINE.md
    print("\n| query | sf0.1 warm (s) | sf1 warm (s) | ratio (10× data) |")
    print("|---|---|---|---|")
    for name in FAMILIES:
        r = report[name]
        print(f"| `{name}` | {r['sf0.1_warm']} | {r['sf1_warm']} | "
              f"{r['ratio']}× |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
