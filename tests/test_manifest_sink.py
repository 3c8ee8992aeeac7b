"""Manifest sink: atomic publication, checksum verification, tamper
localization, append accumulation."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from flight_radar_pipeline_spark.sinks.manifest_sink import (
    ManifestDataSource,
    read_manifest,
    verify_manifest,
)


def _write(spark, df, path, mode="overwrite"):
    spark.dataSource.register(ManifestDataSource)
    df.write.format("manifest").mode(mode).option("path", path).save()


def test_manifest_accounts_for_every_row(spark, tmp_path):
    out = str(tmp_path / "t1")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    _write(spark, df.repartition(4), out)
    m = read_manifest(out)
    assert m["total_rows"] == 1000
    assert 1 <= len(m["files"]) <= 4
    assert verify_manifest(out)["ok"]
    # the data itself reads back complete
    back = spark.read.parquet(f"{out}/part-*.parquet")
    assert back.count() == 1000


def test_tamper_localizes_to_one_file(spark, tmp_path):
    out = str(tmp_path / "t2")
    _write(spark, spark.range(500).repartition(3), out)
    m = read_manifest(out)
    victim = m["files"][0]["file"]
    # corrupt one referenced file by rewriting it with a row dropped
    import pyarrow.parquet as pq

    table = pq.read_table(os.path.join(out, victim))
    pq.write_table(table.slice(1), os.path.join(out, victim))
    report = verify_manifest(out)
    assert report["ok"] is False
    assert report["mismatches"] == [victim]


def test_append_mode_accumulates(spark, tmp_path):
    out = str(tmp_path / "t3")
    _write(spark, spark.range(100).repartition(2), out, mode="overwrite")
    _write(spark, spark.range(100, 150).repartition(1), out, mode="append")
    m = read_manifest(out)
    assert m["total_rows"] == 150
    assert verify_manifest(out)["ok"]


def test_manifest_is_the_publication_point(spark, tmp_path):
    out = str(tmp_path / "t4")
    _write(spark, spark.range(10), out)
    files = set(json.load(open(f"{out}/_MANIFEST.json"))["files"][0].keys())
    assert files == {"file", "rows", "checksum"}
