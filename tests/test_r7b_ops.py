"""Invariant tests for the round-7b additions, beyond the DuckDB oracle
hash (tests/test_battery.py): rank-test statistics against hand-computed
small cases, t-closeness bounds, DSIR target preference, temperature
flattening direction, and the MMR greedy's diversity property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from flight_radar_pipeline_spark.operators.similarity import (
    cosine_similarity,
    mmr_rerank,
    topk_neighbors_bruteforce,
)
from flight_radar_pipeline_spark.plans.battery_r7b import (
    customer_t_closeness,
    doc_dsir_importance,
    doc_lang_temperature_sample,
    event_type_kruskal_wallis,
    event_value_mann_whitney,
)
from flight_radar_pipeline_spark.sources.readers import load_table


def test_mann_whitney_hand_case(spark):
    """Textbook check: group A = {1, 2, 3}, group B = {4, 5} (complete
    separation, no ties): U_A = 0, rank-biserial = −1."""
    rows = [("click", 1.0), ("click", 2.0), ("click", 3.0),
            ("view", 4.0), ("view", 5.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    df.createOrReplaceTempView("__mwu_hand")
    # rebuild the entry's arithmetic on the tiny frame via its own plan
    # by monkey-loading is overkill; restate the pooled-rank formula:
    from pyspark.sql import Window

    v = df.groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("cnt1"),
    )
    w = Window.partitionBy().orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = v.select(
        "cnt", "cnt1",
        (F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0).alias("midrank"),
    )
    row = r.agg(
        F.sum("cnt1").alias("n1"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("midrank") * F.col("cnt1")).alias("r1"),
    ).collect()[0]
    u1 = row.r1 - row.n1 * (row.n1 + 1) / 2.0
    assert u1 == 0.0
    assert 2.0 * u1 / (row.n1 * (row.n - row.n1)) - 1 == -1.0


def test_mann_whitney_entry_bounds(spark):
    row = event_value_mann_whitney(spark, SF_DIR).collect()[0]
    assert row.n_click > 0 and row.n_view > 0
    assert 0 <= row.u_click <= row.n_click * row.n_view
    assert -1.0 <= row.rank_biserial <= 1.0
    # rank-biserial and z must agree in sign (same centered numerator)
    assert (row.z >= 0) == (row.rank_biserial >= 0)


def test_kruskal_wallis_entry_bounds(spark):
    row = event_type_kruskal_wallis(spark, SF_DIR).collect()[0]
    assert row.k_groups == 5
    assert row.h >= 0
    # tie correction divides by C ∈ (0, 1] — can only grow H
    assert row.h_adj >= row.h


def test_t_closeness_bounds_and_coverage(spark):
    rows = customer_t_closeness(spark, SF_DIR).collect()
    n_customers = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.n_customers for r in rows) == n_customers
    for r in rows:
        # TVD is bounded by [0, 1); singleton groups sit strictly inside
        assert 0.0 <= r.t_distance <= 1.0


def test_dsir_prefers_target_language(spark):
    rows = {r.lang: r for r in doc_dsir_importance(spark, SF_DIR).collect()}
    assert set(rows) == {"en", "de", "es", "fr", "zh"}
    # the target slice must score highest on its own ratio test and keep
    # a larger selected fraction than every non-target language
    en_frac = rows["en"].n_selected / rows["en"].n_docs
    for lang, r in rows.items():
        if lang == "en":
            continue
        assert rows["en"].avg_llr > r.avg_llr
        assert en_frac >= r.n_selected / r.n_docs


def test_temperature_sample_flattens(spark):
    rows = {r.lang: r for r in doc_lang_temperature_sample(spark, SF_DIR).collect()}
    shares = sum(r.temp_share for r in rows.values())
    assert shares == pytest.approx(1.0, abs=1e-3)
    # α < 1 moves every share toward uniform: head shrinks, tail grows
    head = max(rows.values(), key=lambda r: r.n_docs)
    tail = min(rows.values(), key=lambda r: r.n_docs)
    assert head.temp_share < head.raw_share
    assert tail.temp_share > tail.raw_share
    for r in rows.values():
        assert 0 <= r.n_sampled <= r.n_docs
        assert 0 < r.rate <= 1.0


def test_mmr_rank1_is_relevance_argmax_and_diversifies(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2)
    sel = mmr_rerank(emb, queries, shortlist_n=12, k=4, lam=0.5)
    rows = sel.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    topk = {
        r.query_id: r.neighbor_id
        for r in topk_neighbors_bruteforce(emb, queries, k=1).collect()
    }
    for qid, sel_rows in by_q.items():
        sel_rows.sort(key=lambda r: r.rank)
        assert len(sel_rows) == 4
        ids = [r.neighbor_id for r in sel_rows]
        assert len(set(ids)) == 4, "selected ids must be distinct"
        assert ids[0] == topk[qid], "rank 1 must be the relevance argmax"
        # every score must satisfy the greedy formula exactly:
        # mmr_score = lam·rel − (1−lam)·max_sim_to_prior, sims rounded 6
        vec = {
            r.vec_id: list(r.embedding)
            for r in emb.filter(F.col("vec_id").isin(ids)).collect()
        }

        def cos(u, v):
            du = sum(x * y for x, y in zip(u, v))
            nu = sum(x * x for x in u) ** 0.5
            nv = sum(y * y for y in v) ** 0.5
            return round(du / (nu * nv), 6)

        for i, r in enumerate(sel_rows[1:], start=1):
            max_sim = max(
                cos(vec[r.neighbor_id], vec[prev]) for prev in ids[:i]
            )
            expect = 0.5 * r.relevance - 0.5 * max_sim
            assert r.mmr_score == pytest.approx(expect, abs=2e-6)


def test_mmr_diversity_vs_pure_topk(spark):
    """The MMR set's internal redundancy (mean pairwise cosine) must not
    exceed the pure-relevance top-k set's — the property the operator
    exists for."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0)

    def mean_pairwise(ids: list[int]) -> float:
        sub = emb.filter(F.col("vec_id").isin(ids))
        a = sub.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
        b = sub.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
        return pairs.select(
            F.avg(cosine_similarity(F.col("va"), F.col("vb"))).alias("m")
        ).collect()[0].m

    mmr_ids = [
        r.neighbor_id
        for r in mmr_rerank(emb, queries, shortlist_n=16, k=5, lam=0.5).collect()
    ]
    top_ids = [
        r.neighbor_id
        for r in topk_neighbors_bruteforce(emb, queries, k=5).collect()
    ]
    assert mean_pairwise(mmr_ids) <= mean_pairwise(top_ids) + 1e-9


def test_mmr_round_mirror_matches_engine_f_round(spark):
    """The driver-greedy mirror's rounding must equal F.round on
    DoubleType — which goes through BigDecimal.valueOf (shortest-repr
    decimal, Python repr), NOT the exact binary expansion (round-14
    ADVICE regression). 2.675's double is 2.67499…875: the engine rounds
    it UP via its '2.675' shortest repr; Decimal(2.675) would round it
    DOWN."""
    from decimal import ROUND_HALF_UP, Decimal

    from flight_radar_pipeline_spark.operators.similarity import (
        _f_round_double,
    )

    cases = [(2.675, 2), (-2.675, 2), (1.5e-7, 7), (0.1234567499999, 7),
             (2.5, 0), (0.12345675, 7)]
    # round()'s scale must be foldable — one literal round per case
    row = (
        spark.range(1)
        .select(
            *[
                F.round(F.lit(x), d).alias(f"r{i}")
                for i, (x, d) in enumerate(cases)
            ]
        )
        .collect()[0]
    )
    engine = [row[i] for i in range(len(cases))]
    mirror = [_f_round_double(x, d) for x, d in cases]
    assert mirror == engine
    # the test must bite: at least one case distinguishes repr-rounding
    # from exact-binary rounding
    binary = [
        float(
            Decimal(x).quantize(
                Decimal(1).scaleb(-d), rounding=ROUND_HALF_UP
            )
        )
        for x, d in cases
    ]
    assert binary != mirror


def test_mmr_null_cosine_degrades_not_raises(spark):
    """A NULL embedding yields NULL cosine via null propagation (under
    ANSI mode a zero-norm divide would raise in-engine before the driver
    loop ever ran, so NULL vectors are the degradation path that
    reaches it); the driver-greedy loop must mirror the old all-Spark
    null semantics (max ignores NULLs, NULL scores sort last) instead of
    raising TypeError (round-14 ADVICE)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, None),  # NULL vector: cosine to anything is NULL
        (3, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == 0)
    out = mmr_rerank(emb, queries, shortlist_n=4, k=3, lam=0.5).collect()
    assert len(out) == 3
    by_rank = [r for r in sorted(out, key=lambda r: r.rank)]
    picked = [r.neighbor_id for r in by_rank]
    # the NULL vector has NULL relevance → sorts last → never beats the
    # two real candidates for the first 2 picks
    assert 2 not in picked[:2]
    assert set(picked) <= {1, 2, 3}
    # a pick whose relevance is NULL carries a NULL mmr_score (the old
    # plan's NULL-propagating arithmetic), not a crash
    for r in by_rank:
        if r.relevance is None:
            assert r.mmr_score is None


def test_mmr_string_ids_round_trip(spark):
    """id column types derive from the shortlist schema — a string id
    corpus must come back with string query/neighbor ids (round-14
    ADVICE: the round-13 rewrite hardcoded long)."""
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.9, 0.1]),
        ("c", [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == "a")
    out = mmr_rerank(emb, queries, shortlist_n=3, k=2, lam=0.5)
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["neighbor_id"] == "string"
    got = out.collect()
    assert {r.query_id for r in got} == {"a"}
    assert all(isinstance(r.neighbor_id, str) for r in got)


def test_mmr_collect_cap_guard(spark):
    """The bounded collects refuse to run above collect_cap instead of
    OOMing the driver (round-14, verdict item 7)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="collect_cap"):
        mmr_rerank(emb, queries, shortlist_n=12, k=4, collect_cap=5)
