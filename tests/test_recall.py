"""Recall characterization for the approximate similarity operators.

Correctness of ANN is oracle-checked (same buckets, same ranks); these
tests guard QUALITY — the approximate result must overlap the exact
brute-force answer above a floor. Everything is hash-deterministic, so
the measured recall is a constant for a given dataset, not a flaky
statistic; the floors are set below the observed values with margin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    return _pairs(S.topk_neighbors_bruteforce(emb, queries, k=5))


def test_lsh_recall_knob(emb, exact):
    """Single-table sign-LSH on near-orthogonal vectors has modest recall
    by construction (the multi-table variant exists for recall); what must
    hold is the knob: fewer planes → bigger buckets → recall does not
    drop, and some overlap with the exact answer survives."""
    queries = emb.filter(F.col("vec_id") < 10)
    r = {}
    for planes in (4, 8):
        got = _pairs(S.topk_neighbors_lsh(emb, queries, k=5, num_planes=planes))
        r[planes] = len(got & exact) / len(exact)
    assert r[4] >= r[8], f"recall should not drop with fewer planes: {r}"
    assert r[4] >= 0.05, f"sign-LSH recall {r} collapsed"


def test_ivf_recall_floor(emb, exact):
    queries = emb.filter(F.col("vec_id") < 10)
    got = _pairs(
        S.topk_neighbors_ivf(emb, queries, k=5, num_centroids=16, nprobe=2)
    )
    recall = len(got & exact) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall:.2f} collapsed"


def test_ivf_recall_rises_with_nprobe(emb, exact):
    queries = emb.filter(F.col("vec_id") < 10)
    r = {}
    for nprobe in (1, 4):
        got = _pairs(
            S.topk_neighbors_ivf(
                emb, queries, k=5, num_centroids=16, nprobe=nprobe
            )
        )
        r[nprobe] = len(got & exact) / len(exact)
    assert r[4] >= r[1], f"recall should not drop as nprobe grows: {r}"
