"""Cache-lifecycle contract (round-7 verdict item 5): operator-held
persists are released in code, not by the clearCache convention.

- ``mutual_nn_pairs`` (reuse is internal): a default call leaves the SQL
  cache manager EMPTY on return — the reciprocity table is an eager
  localCheckpoint whose blocks the ContextCleaner reclaims, and the
  upstream signature cache is released inside the operator.
- pair operators whose reuse spans the caller's action tag their held
  caches; ``persisted_scope`` / ``release`` free them deterministically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.lifecycle import (
    held,
    persisted_scope,
    release,
)


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


def _vectors(spark, n=40, dims=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("embedding"),
    )


def test_mutual_nn_default_call_holds_no_catalog_cache(spark):
    from flight_radar_pipeline_spark.operators.similarity import (
        mutual_nn_pairs,
    )

    spark.catalog.clearCache()
    out = mutual_nn_pairs(_vectors(spark), n_dims=8)
    # the operator already ran its internal materialization; nothing may
    # remain registered in the cache manager before OR after the action
    assert _cache_manager_empty(spark)
    out.count()
    assert _cache_manager_empty(spark)
    assert held(out) == ()


def test_pair_operator_scope_releases_held_caches(spark):
    from flight_radar_pipeline_spark.operators.dedup import near_dup_pairs

    spark.catalog.clearCache()
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta "),
            (F.col("id") % 5).cast("string"),
        ).alias("text"),
    )
    with persisted_scope(
        near_dup_pairs(docs, text_col="text", id_col="doc_id")
    ) as pairs:
        assert len(held(pairs)) == 1  # the shingle explosion
        pairs.count()
        assert not _cache_manager_empty(spark)  # cache alive for the action
    assert _cache_manager_empty(spark)  # and gone on scope exit


def test_release_is_idempotent_and_transitive(spark):
    from flight_radar_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    spark.catalog.clearCache()
    # the expr path keeps the self-join candidate pipeline and its
    # signature persist — the release/held machinery's exercise case
    pairs = cosine_near_dup_pairs(
        _vectors(spark), threshold=0.0, n_dims=8, impl="expr"
    )
    assert len(held(pairs)) == 1  # the signature table
    pairs.count()
    release(pairs)
    assert _cache_manager_empty(spark)
    release(pairs)  # second release is a no-op
    assert held(pairs) == ()


def test_bucket_verify_arrow_path_holds_no_cache(spark):
    """Round-13: the arrow (production) path verifies pairs
    bucket-locally — the signature table is consumed exactly once, so a
    default call persists nothing and leaves the cache manager empty."""
    from flight_radar_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    spark.catalog.clearCache()
    pairs = cosine_near_dup_pairs(_vectors(spark), threshold=0.0, n_dims=8)
    assert held(pairs) == ()
    pairs.count()
    assert _cache_manager_empty(spark)
