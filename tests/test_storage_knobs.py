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


# --------------------------------------------------------------------------
# small-file compaction
# --------------------------------------------------------------------------


def test_compact_unpartitioned_reduces_files_preserves_rows(spark, tmp_path):
    from flight_radar_pipeline_spark.sinks.writers import compact_dataset

    path = str(tmp_path / "frag")
    # simulate incremental appends: 3 batches x 10 tasks = 30 tiny files
    for _ in range(3):
        spark.range(1000).repartition(10).write.mode("append").parquet(path)
    before = sorted(
        r["id"] for r in spark.read.parquet(path).collect()
    )

    report = compact_dataset(spark, path, target_records_per_file=10_000)
    assert report["files_before"] >= 30
    assert report["files_after"] == 1
    assert report["rows"] == 3000
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before


def test_compact_partitioned_respects_layout(spark, tmp_path):
    from pyspark.sql import functions as F

    from flight_radar_pipeline_spark.sinks.writers import compact_dataset

    path = str(tmp_path / "fragp")
    df = spark.range(900).select(
        (F.col("id") % 3).alias("p"), F.col("id").alias("v")
    )
    for _ in range(4):
        df.repartition(5).write.mode("append").partitionBy("p").parquet(path)

    report = compact_dataset(spark, path, partition_cols=["p"])
    assert report["files_before"] > report["files_after"]
    assert report["files_after"] <= 3  # one file per partition value
    got = spark.read.parquet(path)
    assert got.count() == 3600
    # partition layout survives: pruning still sees the partition column
    assert got.filter(F.col("p") == 1).count() == 1200
