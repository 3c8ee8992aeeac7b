"""Invariant tests for the round-7g additions: k-core monotonicity and
degree floor, proximity-pair symmetry bounds, and latency-quantile
ordering."""

from __future__ import annotations

import pytest

from conftest import SF_DIR
from flight_radar_pipeline_spark.plans.battery_r7g import (
    doc_proximity_search,
    entity_kcore_peeling,
    signup_purchase_latency_quantiles,
)
from flight_radar_pipeline_spark.sources.readers import load_table


def test_kcore_monotone_and_nonempty(spark):
    rows = entity_kcore_peeling(spark, SF_DIR).orderBy("round").collect()
    assert len(rows) == 4
    prev = None
    for r in rows:
        assert r.n_customers >= 0 and r.n_suppliers >= 0
        if prev is not None:
            # peeling only removes: survivor counts are non-increasing
            assert r.n_customers <= prev.n_customers
            assert r.n_suppliers <= prev.n_suppliers
            assert r.n_edges <= prev.n_edges
        prev = r
    # the self-sized k must not empty the graph in round 1
    assert rows[0].n_edges > 0


def test_proximity_pairs_bounds(spark):
    rows = doc_proximity_search(spark, SF_DIR).collect()
    total_docs = load_table(spark, SF_DIR, "documents").count()
    assert 0 < sum(r.n_docs for r in rows) <= total_docs
    for r in rows:
        # every doc counted must carry at least one pair
        assert r.n_pairs >= r.n_docs


def test_latency_quantiles_ordered(spark):
    row = signup_purchase_latency_quantiles(spark, SF_DIR).collect()[0]
    assert row.n_converted > 0
    assert 0 <= row.p25_min <= row.p50_min <= row.p75_min <= row.p90_min


def test_kcore_hand_graph_two_round_cascade(spark):
    """Path graph a-b-c-d-e at k=2: round 1 drops the endpoints (deg 1),
    which exposes b and d as new degree-1 nodes; round 2 drops them,
    which strands c — a 3-round cascade to the empty 2-core, the
    sequencing property a single-pass degree filter would get wrong."""
    from flight_radar_pipeline_spark.operators.graph import kcore_peel

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    rounds = kcore_peel(edges, k=2, rounds=3)
    survivors = [
        sorted({r.src for r in df.collect()}) for df in rounds
    ]
    assert survivors[0] == ["b", "c", "d"]
    assert survivors[1] == ["c"] or survivors[1] == []  # c has deg 0 now
    assert survivors[2] == []


def test_kcore_hand_graph_triangle_is_its_own_2core(spark):
    from flight_radar_pipeline_spark.operators.graph import kcore_peel

    und = [("a", "b"), ("b", "c"), ("c", "a")]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    rounds = kcore_peel(edges, k=2, rounds=2)
    for df in rounds:
        assert sorted({r.src for r in df.collect()}) == ["a", "b", "c"]

def test_kcore_unsymmetrized_multiedge_input_is_sanitized(spark):
    """Round-7 ADVICE: an unsymmetrized, multi-edge input must yield the
    same cores as the clean symmetric set — the operator symmetrizes and
    dedupes internally rather than trusting the docstring contract."""
    from flight_radar_pipeline_spark.operators.graph import kcore_peel

    # triangle given one-directionally, with a duplicated edge that
    # would inflate a's degree past any filter if not deduped
    raw = [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a")]
    edges = spark.createDataFrame(raw, "src string, dst string")
    rounds = kcore_peel(edges, k=2, rounds=2)
    for df in rounds:
        assert sorted({r.src for r in df.collect()}) == ["a", "b", "c"]
    # same multi-edge input at k=3: duplicate must NOT lift a/b to deg 3
    rounds3 = kcore_peel(edges, k=3, rounds=1)
    assert rounds3[0].count() == 0


def test_kcore_pre_deduped_matches_default_path(spark):
    """Round-13: `pre_deduped=True` (the entry's fast path — skips the
    internal re-dedup + re-checkpoint of an already-distinct symmetric
    edge set) must peel identically to the guarded default."""
    from flight_radar_pipeline_spark.operators.graph import kcore_peel

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("b", "d")]
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "src string, dst string")
    pre = edges.localCheckpoint(eager=True)
    for k in (2, 3):
        fast = [
            sorted((r.src, r.dst) for r in df.collect())
            for df in kcore_peel(
                pre, k=k, rounds=3, symmetrize=False, pre_deduped=True
            )
        ]
        slow = [
            sorted((r.src, r.dst) for r in df.collect())
            for df in kcore_peel(edges, k=k, rounds=3, symmetrize=False)
        ]
        assert fast == slow


def test_kcore_pre_deduped_with_symmetrize_raises(spark):
    from flight_radar_pipeline_spark.operators.graph import kcore_peel

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="pre_deduped"):
        kcore_peel(edges, k=2, rounds=1, symmetrize=True, pre_deduped=True)


def test_hits_zero_iterations_raises(spark):
    from flight_radar_pipeline_spark.operators.graph import hits_scores

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        hits_scores(edges, iterations=0)
