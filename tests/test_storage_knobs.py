"""Materialization knobs are physical-only: every storage level (and no
persistence at all) must produce byte-identical results — the knob trades
memory/disk/recompute, never semantics."""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel

from flight_radar_pipeline_spark.operators.dedup import (
    near_dup_pairs,
    ngram_jaccard_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_shingle_storage_levels_identical(spark):
    docs = _docs(spark)
    base = sorted(map(tuple, near_dup_pairs(docs).collect()))
    for level in (StorageLevel.DISK_ONLY, None):
        got = sorted(
            map(tuple, near_dup_pairs(docs, shingle_storage=level).collect())
        )
        assert got == base, f"shingle_storage={level} changed results"


def test_sets_storage_levels_identical(spark):
    docs = _docs(spark)
    kw = dict(jaccard_threshold=0.4, maxdf=20)
    base = sorted(map(tuple, ngram_jaccard_pairs(docs, **kw).collect()))
    for level in (StorageLevel.DISK_ONLY, None):
        got = sorted(
            map(tuple, ngram_jaccard_pairs(docs, sets_storage=level, **kw).collect())
        )
        assert got == base, f"sets_storage={level} changed results"
