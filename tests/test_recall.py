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
        got = _pairs(S.topk_neighbors_lsh(emb, queries, k=5, num_planes=planes, n_dims=64))
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


@pytest.fixture(scope="module")
def km_cents(emb):
    return S.kmeans_centroids(emb, k=16, iters=5, n_dims=64)


def test_kmeans_is_deterministic(emb, km_cents):
    """Hash-seeded init + rounded means ⇒ byte-identical centroids on
    recomputation — the property that makes the quantizer auditable."""
    again = S.kmeans_centroids(emb, k=16, iters=5, n_dims=64)
    assert again == km_cents


def test_kmeans_quantizer_recall_ge_first_n(emb, km_cents):
    """k-means centroids must reach at least the first-N quantizer's
    recall at equal nprobe — measured on query sets DISJOINT from the
    first-N centroid ids (queries 0-9 ARE centroids 0-9 under first-N,
    which self-biases its recall to ~1 by construction and would make the
    comparison meaningless). Both quantizers and the data are
    hash-deterministic, so these recalls are dataset constants."""
    for lo, hi in ((100, 110), (200, 220)):
        queries = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        truth = _pairs(S.topk_neighbors_bruteforce(emb, queries, k=5))
        first_n = _pairs(
            S.topk_neighbors_ivf(emb, queries, k=5, num_centroids=16, nprobe=2)
        )
        kmeans = _pairs(
            S.topk_neighbors_ivf(emb, queries, k=5, nprobe=2, centroids=km_cents)
        )
        r_first, r_km = (
            len(first_n & truth) / len(truth),
            len(kmeans & truth) / len(truth),
        )
        assert r_km >= r_first, (
            f"queries [{lo},{hi}): kmeans recall {r_km:.3f} < "
            f"first-N {r_first:.3f}"
        )


def test_signature_impls_identical(emb):
    """The arrow (numpy matmul) and expr (left-to-right fold) signature
    impls must produce byte-identical signatures — the association-order
    margin argument (min |dot| ~1e-4 vs ~1e-14 noise) made executable."""
    for kwargs in ({"num_planes": 8, "n_dims": 64},):
        a = {
            (r["vec_id"], r["signature"])
            for r in S.hyperplane_signatures(emb, impl="arrow", **kwargs).collect()
        }
        b = {
            (r["vec_id"], r["signature"])
            for r in S.hyperplane_signatures(emb, impl="expr", **kwargs).collect()
        }
        assert a == b
    at = {
        (r["vec_id"], r["table"], r["signature"])
        for r in S.multitable_signatures(emb, 4, 4, n_dims=64, impl="arrow").collect()
    }
    bt = {
        (r["vec_id"], r["table"], r["signature"])
        for r in S.multitable_signatures(emb, 4, 4, n_dims=64, impl="expr").collect()
    }
    assert at == bt


def test_ivf_oracle_parity_with_kmeans_centroids(emb, km_cents, duck):
    """The assignment/search stages stay oracle-exact for ANY centroids:
    inject the k-means centroids as DuckDB literals into the same oracle
    template the driver checks, and the Spark IVF plan must hash-match —
    rounded sims, cell tiebreaks, in-cell ranking, all of it."""
    from flight_radar_pipeline_spark.plans.battery_corpus import ivf_oracle_sql
    from oracle import compare

    rows = ", ".join(
        f"({cid}, [{', '.join(repr(x) for x in v)}]::DOUBLE[])"
        for cid, v in km_cents
    )
    sql = ivf_oracle_sql(f"select * from (values {rows}) as t(cent_id, cv)")
    queries = emb.filter(F.col("vec_id") < 10)
    got = S.topk_neighbors_ivf(emb, queries, k=5, nprobe=2, centroids=km_cents)
    compare(got.orderBy("query_id", "neighbor_id"), sql, duck)


def test_ivf_arrow_expr_impls_identical(emb):
    """The Arrow matmul assignment/probe path must produce exactly the
    expression path's results (rounding to 6dp absorbs the matmul's
    association-order noise; ties break cid-asc in both)."""
    queries = emb.filter(F.col("vec_id") < 10)
    arrow = _pairs(S.topk_neighbors_ivf(emb, queries, k=5, nprobe=2, impl="arrow"))
    expr = _pairs(S.topk_neighbors_ivf(emb, queries, k=5, nprobe=2, impl="expr"))
    assert arrow == expr


def test_kmeans_arrow_expr_impls_identical(emb):
    a = S.kmeans_centroids(emb, k=8, iters=3, n_dims=64, impl="arrow")
    e = S.kmeans_centroids(emb, k=8, iters=3, n_dims=64, impl="expr")
    assert a == e


def test_semantic_dedup_recall_vs_all_pairs(emb):
    """SemDeDup characterization at the battery constants (k=8, iters=3,
    t=0.35): (1) the decision table drops EXACTLY the higher ids of the
    in-cell true pairs — the operator's contract; (2) in-cell recall of
    the exact all-pairs truth is pinned as a deterministic constant.

    The recall floor is deliberately modest: this synthetic corpus has NO
    pairs above cosine 0.5, so t=0.35 sits at the random-similarity noise
    floor where borderline pairs scatter across cells. Real near-dup
    corpora are deduped at t≈0.9+, where duplicates are near-identical
    vectors that co-cluster almost surely — the regime the operator is
    built for."""
    from flight_radar_pipeline_spark.operators.similarity import (
        assign_cell,
        cosine_similarity,
        kmeans_centroids,
        semantic_dedup_decisions,
    )

    t = 0.35
    cents = kmeans_centroids(emb, k=8, iters=3, n_dims=64)
    vd = F.col("embedding").cast("array<double>")
    a = emb.select(F.col("vec_id").alias("id_a"), vd.alias("__va"))
    b = emb.select(F.col("vec_id").alias("id_b"), vd.alias("__vb"))
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6) >= t
        )
        .select("id_a", "id_b")
        .collect()
    }
    assert true_pairs, "threshold found no pairs — test data changed?"

    cells = {
        r["vec_id"]: r["cell"]
        for r in emb.select(
            "vec_id", assign_cell(vd, cents).alias("cell")
        ).collect()
    }
    in_cell = {p for p in true_pairs if cells[p[0]] == cells[p[1]]}
    recall = len(in_cell) / len(true_pairs)
    assert recall >= 0.3, f"in-cell recall {recall:.2f} below floor"

    # the decision table drops exactly the higher ids of in-cell pairs
    dropped = {
        r["vec_id"]
        for r in semantic_dedup_decisions(emb, cents, threshold=t)
        .filter(~F.col("kept"))
        .collect()
    }
    assert dropped == {hi for _, hi in in_cell}


def test_pq_arrow_expr_impls_identical(emb):
    """The PQ audit's numpy fast path must agree exactly with the
    pure-expression reference (codes AND rounded MSE) — the same
    contract the sign-LSH / IVF arrow paths hold."""
    from flight_radar_pipeline_spark.operators.linalg import (
        pq_reconstruction_error,
    )

    rows = lambda impl: sorted(  # noqa: E731
        map(
            tuple,
            pq_reconstruction_error(
                emb, n_dims=64, m=4, k=8, iters=2, impl=impl
            ).collect(),
        )
    )
    assert rows("arrow") == rows("expr")


def test_semantic_dedup_arrow_expr_impls_identical(emb):
    from flight_radar_pipeline_spark.operators.similarity import (
        kmeans_centroids,
        semantic_dedup_decisions,
    )

    cents = kmeans_centroids(emb, k=8, iters=3, n_dims=64)
    rows = lambda impl: sorted(  # noqa: E731
        map(
            tuple,
            semantic_dedup_decisions(
                emb, cents, threshold=0.35, impl=impl
            ).collect(),
        )
    )
    assert rows("arrow") == rows("expr")


def test_recommended_planes_monotone_and_floor():
    from flight_radar_pipeline_spark.operators.similarity import (
        recommended_planes,
        recommended_semantic_k,
    )

    assert recommended_planes(100) == 4           # floor
    assert recommended_planes(400 * 16) == 4      # 2^4 buckets of 400
    assert recommended_planes(400 * 16 * 10) == 8  # 10x corpus -> more planes
    ks = [recommended_planes(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert ks == sorted(ks)
    assert recommended_semantic_k(5_000) == 8     # floor at bench scale
    assert recommended_semantic_k(50_000) == 50
    assert recommended_semantic_k(500_000) == 500


def test_ivfpq_recall_ladder(emb, exact):
    """The compressed index's quality ladder on deliberately-hard
    isotropic vectors: ADC-only recall sits well below plain IVF (k=8
    codewords per subspace cannot represent random 16-dim data), the
    refinement stage recovers monotonically with shortlist size, and at
    refine = everything-probed it meets plain IVF exactly (refinement
    re-scores with the true cosine, so only routing loss remains)."""
    queries = emb.filter(F.col("vec_id") < 10)
    kw = dict(k=5, num_centroids=16, nprobe=2, m=4, codebook_k=8,
              iters=2, n_dims=64)
    adc = _pairs(S.topk_neighbors_ivfpq(emb, queries, **kw))
    r_adc = len(adc & exact) / len(exact)
    assert r_adc >= 0.15, f"ADC recall {r_adc:.2f} collapsed"

    r_prev = r_adc
    for refine in (15, 25):
        got = _pairs(S.topk_neighbors_ivfpq(emb, queries, refine=refine, **kw))
        r = len(got & exact) / len(exact)
        assert r >= r_prev - 1e-9, f"refine={refine} dropped recall: {r} < {r_prev}"
        r_prev = r

    ivf = _pairs(S.topk_neighbors_ivf(emb, queries, k=5, num_centroids=16,
                                      nprobe=2))
    full = _pairs(
        S.topk_neighbors_ivfpq(emb, queries, refine=10_000, **kw)
    )
    assert full == ivf, "full refinement must equal plain IVF (routing-only loss)"


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_ivfpq_arrow_expr_impls_identical(emb):
    """The Arrow (numpy matmul) coarse-cell / probe / subspace-code path
    of IVF-PQ must produce exactly the expression path's results —
    including the reconstruction cosines, which depend on every code
    choice (rounding to 6dp absorbs matmul association-order noise; ties
    break cid-asc in both)."""
    queries = emb.filter(F.col("vec_id") < 10)
    kw = dict(k=5, num_centroids=16, nprobe=2, m=4, codebook_k=8,
              iters=2, n_dims=64)
    a = S.topk_neighbors_ivfpq(emb, queries, impl="arrow", **kw)
    e = S.topk_neighbors_ivfpq(emb, queries, impl="expr", **kw)
    cols = ("query_id", "neighbor_id", "cosine")
    assert _rows(a, *cols) == _rows(e, *cols)
    ar = S.topk_neighbors_ivfpq(emb, queries, impl="arrow", refine=16, **kw)
    er = S.topk_neighbors_ivfpq(emb, queries, impl="expr", refine=16, **kw)
    assert _rows(ar, *cols) == _rows(er, *cols)


def test_near_dup_pair_verify_impls_identical(emb):
    """The Arrow pair-dot verify of cosine_near_dup_pairs must equal the
    expression fold verify row-for-row including the rounded cosines
    (threshold=-2 keeps every candidate, so every pair's value is
    compared, not just the survivors)."""
    cols = ("id_a", "id_b", "cosine")
    a = S.cosine_near_dup_pairs(emb, threshold=-2.0, n_dims=64, impl="arrow")
    e = S.cosine_near_dup_pairs(emb, threshold=-2.0, n_dims=64, impl="expr")
    assert _rows(a, *cols) == _rows(e, *cols)


def test_cluster_assignment_impls_identical(emb):
    """kmeans_cluster_assignments' Arrow struct path must equal the
    expression argmax path — cell ids AND winning cosines."""
    cents = S.collect_centroids(emb, 16)
    cols = ("vec_id", "cell", "cosine")
    a = S.kmeans_cluster_assignments(emb, cents, impl="arrow")
    e = S.kmeans_cluster_assignments(emb, cents, impl="expr")
    assert _rows(a, *cols) == _rows(e, *cols)
