"""Unit tests for the second round-6 operator batch: Adamic–Adar link
prediction (hand-computed scores, maxdf exclusion), asymmetric n-gram
containment (subset scores 1.0 one way, below threshold the other), CDC
apply (tombstones, delete-then-reinsert resurrection, idempotent
replay), and grid nearest-neighbor (tie determinism, directedness).

The battery entries prove these against DuckDB oracles on the testdata;
these pin the semantics the uniform testdata can't isolate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.dedup import ngram_containment_pairs
from flight_radar_pipeline_spark.operators.graph import adamic_adar_pairs
from flight_radar_pipeline_spark.operators.spatial import geo_nearest_within
from flight_radar_pipeline_spark.pipeline import cdc_apply


# --------------------------------------------------------------------------
# adamic_adar_pairs
# --------------------------------------------------------------------------

def test_adamic_adar_hand_computed(spark):
    # items: i1 shared by u1,u2,u3 (deg 3); i2 by u1,u2 (deg 2);
    # i3 by u2,u3 (deg 2); i4 by u1 alone (deg 1 — never pairs);
    # hot item shared by everyone (excluded by maxdf=3 with deg 4).
    m = spark.createDataFrame(
        [("u1", "i1"), ("u2", "i1"), ("u3", "i1"),
         ("u1", "i2"), ("u2", "i2"),
         ("u2", "i3"), ("u3", "i3"),
         ("u1", "i4"),
         ("u1", "hot"), ("u2", "hot"), ("u3", "hot"), ("u4", "hot")],
        "user string, item string",
    )
    got = {
        (r.id_a, r.id_b): (r.n_common, r.adamic_adar)
        for r in adamic_adar_pairs(m, maxdf=3, min_common=2).collect()
    }
    # u1-u2 share i1,i2 → 1/ln3 + 1/ln2; u2-u3 share i1,i3 → same;
    # u1-u3 share only i1 → n_common=1, filtered by min_common=2.
    expect = round(1 / math.log(3) + 1 / math.log(2), 4)
    assert got == {("u1", "u2"): (2, expect), ("u2", "u3"): (2, expect)}


def test_adamic_adar_duplicate_membership_rows_collapse(spark):
    # the same (user, item) row repeated must not inflate degree or count
    m = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("a", "y"), ("b", "y")],
        "user string, item string",
    )
    rows = adamic_adar_pairs(m, maxdf=10, min_common=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.n_common) == ("a", "b", 2)
    assert r.adamic_adar == round(2 / math.log(2), 4)


# --------------------------------------------------------------------------
# ngram_containment_pairs
# --------------------------------------------------------------------------

def test_containment_is_asymmetric(spark):
    # doc 2 is a strict prefix of doc 1: containment(2→1) = 1.0 but
    # containment(1→2) is small; threshold 0.8 keeps only one direction.
    long = "a b c d e f g h i j k l m n o p"
    short = "a b c d e f"  # 4 trigrams, all inside long's 14
    docs = spark.createDataFrame([(1, long), (2, short)], "doc_id long, text string")
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in ngram_containment_pairs(
            docs, containment_threshold=0.8, maxdf=100
        ).collect()
    }
    assert got == {(2, 1): 1.0}


def test_containment_refuses_unbounded_maxdf(spark):
    # maxdf=None would make the per-gram candidate set (and its
    # aggregation buffer) unbounded — the operator must refuse, not OOM
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="maxdf"):
        ngram_containment_pairs(docs, maxdf=None)


def test_containment_maxdf_caps_universe_on_both_sides(spark):
    # with maxdf=1 every shared gram is hot (df=2) → no candidates at all
    docs = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w")], "doc_id long, text string"
    )
    assert ngram_containment_pairs(docs, containment_threshold=0.1, maxdf=1).count() == 0
    # cap above every df: identical docs contain each other both ways at 1.0
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in ngram_containment_pairs(
            docs, containment_threshold=0.9, maxdf=100
        ).collect()
    }
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


# --------------------------------------------------------------------------
# cdc_apply
# --------------------------------------------------------------------------

def _log(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, seq long, op string")


def test_cdc_tombstone_and_resurrection(spark):
    log = _log(spark, [
        (1, "a", 1, "I"), (1, "b", 2, "U"),            # survives as b
        (2, "x", 1, "I"), (2, None, 2, "D"),           # tombstoned
        (3, "p", 1, "I"), (3, None, 2, "D"), (3, "q", 3, "I"),  # resurrected
    ])
    got = {r.k: r.v for r in cdc_apply(log, ["k"]).collect()}
    assert got == {1: "b", 3: "q"}


def test_cdc_replay_idempotent(spark):
    rows = [(1, "a", 1, "I"), (1, "b", 2, "U"), (2, "x", 1, "I")]
    once = cdc_apply(_log(spark, rows), ["k"])
    twice = cdc_apply(_log(spark, rows + rows), ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_cdc_drops_bookkeeping_columns(spark):
    out = cdc_apply(_log(spark, [(1, "a", 1, "I")]), ["k"])
    assert out.columns == ["k", "v"]


# --------------------------------------------------------------------------
# geo_nearest_within
# --------------------------------------------------------------------------

def test_nearest_is_directed_and_tie_deterministic(spark):
    # p2 and p3 are equidistant from p1 (exact mirror) → tiebreak picks
    # the smaller id (p2). p2's nearest is p1 (closer than p3); p4 is
    # isolated and absent from the result.
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 0.5), (3, 0.0, -0.5), (4, 30.0, 20.0)],
        "id long, lat double, lon double",
    )
    got = {r.id: r.nn_id for r in geo_nearest_within(
        pts, "id", "lat", "lon", radius_km=200.0, cell_deg=4.0, max_abs_lat=45.0
    ).collect()}
    assert got == {1: 2, 2: 1, 3: 1}


# --------------------------------------------------------------------------
# pair_combinations (the shared a-priori device)
# --------------------------------------------------------------------------

def test_pair_combinations_matches_itertools(spark):
    from itertools import combinations

    from flight_radar_pipeline_spark.functions.text import pair_combinations

    df = spark.createDataFrame(
        [(1, [3, 1, 4, 1, 5]), (2, [7]), (3, [])],
        "k long, xs array<bigint>",
    )
    rows = {
        r.k: sorted((p.id_a, p.id_b) for p in r.ps)
        for r in df.select(
            "k", pair_combinations(F.array_sort("xs")).alias("ps")
        ).collect()
    }
    assert rows[1] == sorted(combinations(sorted([3, 1, 4, 1, 5]), 2))
    assert rows[2] == []  # singleton: no pair
    assert rows[3] == []  # empty: no pair
    # custom field names flow through
    named = (
        df.filter("k = 1")
        .select(pair_combinations(F.array_sort("xs"), "u", "v").alias("ps"))
        .collect()[0]
        .ps[0]
    )
    assert named.asDict().keys() == {"u", "v"}
