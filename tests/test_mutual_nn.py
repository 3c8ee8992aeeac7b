"""Mutual-NN reciprocity semantics on hand-built geometries — the hub
case the near-uniform testdata embeddings can't isolate: a popular
vector that is many vectors' nearest neighbor must pair with at most ONE
of them (its own top-1), and non-reciprocal arrows must vanish.

Vectors are chosen with tiny angular spread so every pair collides in
the deterministic md5-derived LSH buckets (signatures are fixed given
the seeds, so these tests are exactly reproducible).
"""

from __future__ import annotations

from flight_radar_pipeline_spark.operators.similarity import mutual_nn_pairs


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_mutual_pair_found_nonreciprocal_excluded(spark):
    # 1 and 2 are each other's top-1; 3's top-1 is 2, but nn(2)=1 — the
    # one-way arrow 3→2 must not survive.
    df = _emb(
        spark,
        [(1, [1.0, 0.10]), (2, [1.0, 0.11]), (3, [1.0, 0.16])],
    )
    got = _pairs(mutual_nn_pairs(df, num_tables=2, planes_per_table=4, n_dims=2))
    assert got == {(1, 2)}


def test_hub_pairs_with_only_its_own_top1(spark):
    # hub (id 2) is nearest neighbor of BOTH 1 and 3; its own top-1 ties
    # and breaks toward the smaller dst id, so only (1, 2) is mutual.
    df = _emb(
        spark,
        [(1, [1.0, -0.2]), (2, [1.0, 0.0]), (3, [1.0, 0.2])],
    )
    got = _pairs(mutual_nn_pairs(df, num_tables=2, planes_per_table=4, n_dims=2))
    assert got == {(1, 2)}


def test_two_isolated_mutual_pairs(spark):
    # two tight pairs far apart in angle: both must appear, no cross pair.
    df = _emb(
        spark,
        [
            (1, [1.0, 0.01]),
            (2, [1.0, 0.012]),
            (3, [0.01, 1.0]),
            (4, [0.012, 1.0]),
        ],
    )
    got = _pairs(mutual_nn_pairs(df, num_tables=2, planes_per_table=3, n_dims=2))
    assert got == {(1, 2), (3, 4)}
