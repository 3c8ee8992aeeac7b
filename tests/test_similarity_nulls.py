"""Pin the documented null semantics of the vector math
(operators/similarity.py module docstring): signature dots COALESCE null
components to 0.0 — a stray null degrades one term instead of nulling the
whole signature — while the exact-verify dot deliberately PROPAGATES
nulls so corrupt vectors surface as null cosines, never silently wrong
ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.similarity import (
    cosine_similarity,
    hyperplane_signatures,
)


def _emb(spark, vec):
    return spark.createDataFrame(
        [(0, vec)], "vec_id long, embedding array<double>"
    )


def test_signature_degrades_not_nulls_on_null_component(spark):
    vec = [0.5, -1.0, 2.0, 0.25]
    with_null = vec.copy()
    with_null[1] = None
    zeroed = vec.copy()
    zeroed[1] = 0.0

    def sig(v):
        return hyperplane_signatures(
            _emb(spark, v), num_planes=8, n_dims=4, impl="expr"
        ).collect()[0]["signature"]

    s_null, s_zero = sig(with_null), sig(zeroed)
    assert s_null is not None and len(s_null) == 8
    # null component behaves exactly like a 0.0 component (SUM-skips-null)
    assert s_null == s_zero


def test_exact_verify_dot_propagates_null(spark):
    df = _emb(spark, [1.0, None, 3.0])
    out = df.select(
        cosine_similarity(
            F.col("embedding"), F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0))
        ).alias("c")
    ).collect()
    assert out[0]["c"] is None
