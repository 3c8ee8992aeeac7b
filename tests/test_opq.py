"""OPQ rotation contract: orthonormality, impl equality, and the
measured reconstruction-error improvement over raw PQ that justifies the
rotation's existence (the battery entry is rows-only at the driver gate,
so this test is its accuracy evidence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators import linalg as L
from flight_radar_pipeline_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.01"
DIMS, M = 64, 4


@pytest.fixture(scope="module")
def rotation(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cov = L.second_moment_matrix(emb, n_dims=DIMS)
    return L.opq_rotation(cov, n_dims=DIMS, m=M)


def test_rotation_is_orthonormal(rotation):
    import numpy as np

    R = np.array(rotation)
    assert R.shape == (DIMS, DIMS)
    assert np.abs(R.T @ R - np.eye(DIMS)).max() < 1e-9


def test_rotate_impls_agree(spark, rotation):
    emb = load_table(spark, SF_DIR, "embeddings").limit(50)
    a = {
        r.vec_id: r.embedding
        for r in L.rotate_vectors(emb, rotation, impl="arrow").collect()
    }
    e = {
        r.vec_id: r.embedding
        for r in L.rotate_vectors(emb, rotation, impl="expr").collect()
    }
    assert set(a) == set(e)
    for vid in a:
        assert max(
            abs(x - y) for x, y in zip(a[vid], e[vid])
        ) < 1e-9, vid


def test_opq_beats_raw_pq_mse(spark):
    """The point of the rotation: mean reconstruction MSE must drop vs
    the un-rotated hash-checked twin. The corpus is near-isotropic so the
    win is modest (~3.6% at sf0.01) — but it must be a win."""
    emb = load_table(spark, SF_DIR, "embeddings")
    raw = (
        L.pq_reconstruction_error(emb, n_dims=DIMS, m=M, k=8, iters=2)
        .agg(F.avg("mse"))
        .first()[0]
    )
    opq = (
        L.opq_reconstruction_error(emb, n_dims=DIMS, m=M, k=8, iters=2)
        .agg(F.avg("mse"))
        .first()[0]
    )
    assert opq < raw, f"OPQ mse {opq} did not beat raw PQ mse {raw}"
    assert opq < 0.99 * raw, f"improvement below 1%: {raw} -> {opq}"
