"""Unit semantics for the quality batch: bigram-LM scoring, PII
redaction, PageRank. (Oracle parity for the battery entries rides in
tests/test_battery.py's full-registry sweep.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T
from flight_radar_pipeline_spark.operators.graph import pagerank
from flight_radar_pipeline_spark.operators.lm import (
    bigram_instances,
    bigram_lm_scores,
)


# --------------------------------------------------------------------------
# bigram LM
# --------------------------------------------------------------------------


def test_bigram_instances_adjacency(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, "p q")], ["doc_id", "text"]
    )
    got = sorted(
        map(tuple, bigram_instances(docs).select("doc_id", "w1", "w2").collect())
    )
    # single-token docs emit nothing
    assert got == [(1, "a", "b"), (1, "b", "c"), (3, "p", "q")]


def test_bigram_lm_hand_computed(spark):
    # corpus: "a b", "a b", "a c" → c(a,b)=2, c(a,c)=1, c1(a)=3, V=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    rows = {
        r["doc_id"]: r
        for r in bigram_lm_scores(docs, alpha=0.5).collect()
    }
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ac = (1 + 0.5) / (3 + 0.5 * 3)
    assert rows[1]["n_bigrams"] == 1
    assert rows[1]["avg_nll"] == pytest.approx(round(-math.log(p_ab), 4))
    assert rows[3]["avg_nll"] == pytest.approx(round(-math.log(p_ac), 4))
    # the rarer continuation scores strictly higher (worse)
    assert rows[3]["avg_nll"] > rows[1]["avg_nll"]


def test_bigram_lm_flags_out_of_distribution(spark):
    # one doc repeats the corpus-dominant pattern, one is all-novel text;
    # the novel doc must score materially higher avg_nll
    common = [(i, "the quick fox " * 5) for i in range(8)]
    docs = spark.createDataFrame(
        common + [(99, "zxq wvu tsr qpo nml")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["avg_nll"] for r in bigram_lm_scores(docs).collect()}
    assert rows[99] > rows[0] + 1.0


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------


def test_pii_redaction_masks_and_counts(spark):
    txt = (
        "mail a.b+c@test.org or ops@x.co.uk, host 192.168.0.1, "
        "order 123456789 ok, short 1234 stays, 10.0.0.255 too"
    )
    df = spark.createDataFrame([(txt,)], ["text"])
    row = df.select(
        *[
            T.pii_count("text", p).alias(f"n_{name}")
            for name, p, _ in T.PII_PATTERNS
        ],
        T.redact_pii("text").alias("red"),
    ).first()
    assert (row["n_email"], row["n_ipv4"], row["n_idnum"]) == (2, 2, 1)
    assert row["red"] == (
        "mail <EMAIL> or <EMAIL>, host <IP>, "
        "order <NUM> ok, short 1234 stays, <IP> too"
    )


def test_pii_redaction_clean_text_untouched(spark):
    df = spark.createDataFrame([("no pii here at all",)], ["text"])
    row = df.select(T.redact_pii("text").alias("red")).first()
    assert row["red"] == "no pii here at all"


# --------------------------------------------------------------------------
# funnel stage machine
# --------------------------------------------------------------------------


def test_funnel_requires_order_and_strict_time(spark):
    from datetime import datetime

    from flight_radar_pipeline_spark.operators.temporal import funnel_stages

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # u1: full ordered funnel
        (1, t(1), 1, "signup"), (1, t(2), 2, "click"), (1, t(3), 3, "purchase"),
        # u2: click BEFORE signup never counts; no click after → stage 1
        (2, t(1), 4, "click"), (2, t(2), 5, "signup"), (2, t(3), 6, "purchase"),
        # u3: click at the SAME timestamp as signup does not advance
        (3, t(1), 7, "signup"), (3, t(1), 8, "click"),
        # u4: later signup can't resurrect — first signup anchors the chain
        (4, t(5), 9, "signup"), (4, t(1), 10, "click"), (4, t(6), 11, "click"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {
        r["user_id"]: r["stage"]
        for r in funnel_stages(ev, ["signup", "click", "purchase"]).collect()
    }
    assert got == {1: 3, 2: 1, 3: 1, 4: 2}


# --------------------------------------------------------------------------
# contiguous ids
# --------------------------------------------------------------------------


def test_contiguous_ids_match_global_row_number(spark):
    import random

    from flight_radar_pipeline_spark.operators.ids import contiguous_ids

    keys = random.Random(7).sample(range(10_000), 500)
    df = spark.createDataFrame([(k,) for k in keys], ["k"]).repartition(13)
    got = {r["k"]: r["row_id"] for r in contiguous_ids(df, "k", buckets=8).collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_contiguous_ids_survive_degenerate_buckets(spark):
    from flight_radar_pipeline_spark.operators.ids import contiguous_ids

    # fewer rows than buckets → most buckets empty; ids must stay dense
    df = spark.createDataFrame([(k,) for k in (5, 3, 9)], ["k"])
    got = sorted(
        map(tuple, contiguous_ids(df, "k", buckets=64).select("k", "row_id").collect())
    )
    assert got == [(3, 0), (5, 1), (9, 2)]


# --------------------------------------------------------------------------
# count-min sketch
# --------------------------------------------------------------------------


def test_cms_never_undercounts_and_is_tight_without_collisions(spark):
    from flight_radar_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    rows = [(k,) for k in [1] * 50 + [2] * 7 + [3] * 1 + [4] * 20]
    df = spark.createDataFrame(rows, ["k"])
    sketch = cms_sketch(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sketch, keys, "k", depth=4, width=64).collect()
    }
    true = {1: 50, 2: 7, 3: 1, 4: 20}
    for k, t in true.items():
        assert est[k] >= t  # CMS never under-counts
    # 4 keys in 4x64 grid: some row is collision-free for each key
    assert est == true


def test_cms_sketches_merge_by_addition(spark):
    from flight_radar_pipeline_spark.operators.sketches import cms_sketch

    a = spark.createDataFrame([(k,) for k in [1, 1, 2, 5]], ["k"])
    b = spark.createDataFrame([(k,) for k in [1, 3, 5, 5]], ["k"])
    both = a.union(b)

    def grid(df):
        return {
            (r["row"], r["bucket"]): r["c"]
            for r in cms_sketch(df, "k", depth=4, width=16).collect()
        }

    ga, gb, gu = grid(a), grid(b), grid(both)
    merged = {
        cell: ga.get(cell, 0) + gb.get(cell, 0) for cell in set(ga) | set(gb)
    }
    assert merged == gu  # linearity: sketch(A ∪ B) = sketch(A) + sketch(B)


# --------------------------------------------------------------------------
# power-iteration PCA
# --------------------------------------------------------------------------


def test_top_component_matches_numpy_power_iteration(spark):
    import numpy as np

    from flight_radar_pipeline_spark.operators.linalg import (
        _seed_vector,
        top_principal_component,
    )

    rng_rows = [
        [1.0, 2.0, 0.5, -1.0],
        [2.0, 4.1, 1.0, -2.2],
        [0.9, 2.2, 0.4, -0.8],
        [-0.1, 0.2, 3.0, 0.1],
    ]
    df = spark.createDataFrame([(r,) for r in rng_rows], ["embedding"])
    got = {
        r["dim"]: r["loading"]
        for r in top_principal_component(df, n_dims=4, iterations=3).collect()
    }

    X = np.array(rng_rows)
    v = np.array(_seed_vector(4))
    for _ in range(3):
        w = X.T @ (X @ v)
        v = w / np.linalg.norm(w)
    if v.sum() < 0:
        v = -v
    for i in range(4):
        assert got[i] == pytest.approx(round(v[i], 6), abs=1e-6)


def test_top_component_finds_dominant_direction(spark):
    from flight_radar_pipeline_spark.operators.linalg import (
        top_principal_component,
    )

    # data concentrated along e1 → loading ≈ (1, 0, 0)
    rows = [([float(s), 0.01 * s, 0.0],) for s in (-3, -1, 1, 2, 3, 5)]
    df = spark.createDataFrame(rows, ["embedding"])
    got = {
        r["dim"]: r["loading"]
        for r in top_principal_component(df, n_dims=3, iterations=5).collect()
    }
    assert abs(got[0]) > 0.999
    assert abs(got[1]) < 0.05 and abs(got[2]) < 0.001


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------


def _ranks(spark, edge_tuples, **kw):
    edges = spark.createDataFrame(edge_tuples, ["src", "dst"])
    return {r["node"]: r["pr"] for r in pagerank(edges, **kw).collect()}


def test_pagerank_mass_conserved_on_symmetric_graph(spark):
    # symmetric graph → no dangling mass → ranks sum to 1
    sym = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c")]
    pr = _ranks(spark, sym, iterations=4)
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)
    # endpoints of the path are symmetric, as are the two middles
    assert pr["a"] == pytest.approx(pr["d"], abs=1e-8)
    assert pr["b"] == pytest.approx(pr["c"], abs=1e-8)
    assert pr["b"] > pr["a"]


def test_pagerank_matches_hand_iteration(spark):
    # tiny directed triangle + feeder, 2 iterations, hand-run the
    # recurrence in python floats
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    pr = _ranks(spark, edges, iterations=2, decimals=8)
    nodes = ["a", "b", "c", "d"]
    out = {"a": ["b"], "b": ["c"], "c": ["a"], "d": ["a"]}
    rank = {n: 1 / 4 for n in nodes}
    for _ in range(2):
        nxt = {}
        for v in nodes:
            mass = sum(
                rank[u] / len(out[u]) for u in nodes if v in out[u]
            )
            nxt[v] = 0.15 / 4 + 0.85 * mass
        rank = nxt
    for n in nodes:
        assert pr[n] == pytest.approx(round(rank[n], 8), abs=1e-8)
