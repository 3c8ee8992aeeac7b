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


# --------------------------------------------------------------------------
# streaming writer: per-batch manifests + replay idempotence
# --------------------------------------------------------------------------


def test_stream_writer_publishes_per_batch_manifests(spark, tmp_path):
    from flight_radar_pipeline_spark.sinks.manifest_sink import (
        read_stream_manifests,
    )

    src_dir, out, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "s1"),
        str(tmp_path / "ckpt"),
    )
    spark.range(300).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    ).coalesce(1).write.parquet(src_dir)

    spark.dataSource.register(ManifestDataSource)
    schema = spark.read.parquet(src_dir).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("manifest")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = read_stream_manifests(out)
    assert merged["total_rows"] == 300
    assert merged["batch_ids"] == sorted(merged["batch_ids"])
    assert verify_manifest(out, manifest=merged)["ok"]
    # the data reads back complete through the manifest-referenced files
    back = spark.read.parquet(
        *[os.path.join(out, e["file"]) for e in merged["files"]]
    )
    assert back.count() == 300

    # restarting the finished stream with the same checkpoint publishes
    # nothing new (no new source data, no replayed manifests)
    q2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("manifest")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert read_stream_manifests(out)["total_rows"] == 300


def test_stream_commit_replay_is_idempotent(tmp_path):
    """Crash-between-sink-commit-and-checkpoint: Spark re-runs the batch
    with the SAME batchId and fresh task outputs. The second commit must
    leave the first manifest untouched so readers never see the replay."""
    from flight_radar_pipeline_spark.sinks.manifest_sink import (
        FileCommit,
        ManifestStreamWriter,
        read_stream_manifests,
    )

    out = str(tmp_path / "replay")
    os.makedirs(out)
    w = ManifestStreamWriter({"path": out})
    w.commit([FileCommit("part-aaa.parquet", 10, 123)], batchId=7)
    first = read_stream_manifests(out)
    # replayed batch 7 arrives with different (re-run) task outputs
    w.commit([FileCommit("part-bbb.parquet", 10, 456)], batchId=7)
    assert read_stream_manifests(out) == first
    assert first["files"][0]["file"] == "part-aaa.parquet"


# --------------------------------------------------------------------------
# read side: manifest-resolved reads ignore orphans
# --------------------------------------------------------------------------


def test_reads_resolve_through_manifest_not_directory(spark, tmp_path):
    from flight_radar_pipeline_spark.sinks.manifest_sink import (
        read_manifest_table,
    )

    out = str(tmp_path / "r1")
    _write(spark, spark.range(200).repartition(2), out)
    # an orphan from an aborted/replayed write: on disk, in no manifest
    spark.range(999).coalesce(1).write.parquet(str(tmp_path / "orphan"))
    orphan_src = next(
        p for p in (tmp_path / "orphan").iterdir() if p.suffix == ".parquet"
    )
    orphan_dst = os.path.join(out, "part-orphan.parquet")
    os.rename(str(orphan_src), orphan_dst)

    # native fast path
    assert read_manifest_table(spark, out).count() == 200
    # Python DataSource reader (arrow batches)
    back = spark.read.format("manifest").option("path", out).load()
    assert back.count() == 200
    assert {r.id for r in back.collect()} == set(range(200))
    # a directory glob would have seen the orphan — that's the point
    globbed = spark.read.parquet(f"{out}/part-*.parquet").count()
    assert globbed == 200 + 999


def test_manifest_reader_sees_streaming_commits(spark, tmp_path):
    from flight_radar_pipeline_spark.sinks.manifest_sink import (
        FileCommit,
        ManifestStreamWriter,
        read_manifest_table,
    )

    out = str(tmp_path / "r2")
    # batch write plus a hand-committed streaming batch over the same dir
    _write(spark, spark.range(50).repartition(1), out)
    extra = spark.range(50, 80).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(extra), os.path.join(out, "part-s0.parquet"))
    ManifestStreamWriter({"path": out}).commit(
        [FileCommit("part-s0.parquet", 30, 0)], batchId=0
    )
    assert read_manifest_table(spark, out).count() == 80
    assert (
        spark.read.format("manifest").option("path", out).load().count() == 80
    )


def test_manifest_stream_reader_tails_commits_exactly_once(spark, tmp_path):
    """Write-stream publishes per-batch manifests; a read-stream tails
    them. After a new commit, a same-checkpoint restart of the reader
    emits ONLY the delta — table-tailing CDC over the commit protocol."""
    from flight_radar_pipeline_spark.sinks.manifest_sink import (
        FileCommit,
        ManifestStreamWriter,
    )

    src_dir, table, ck_w, ck_r, sink = (
        str(tmp_path / p) for p in ("src", "tbl", "ckw", "ckr", "out")
    )
    spark.range(120).select(F.col("id")).coalesce(1).write.parquet(src_dir)
    spark.dataSource.register(ManifestDataSource)
    schema = spark.read.parquet(src_dir).schema

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.format("manifest")
        .option("path", table).option("checkpointLocation", ck_w)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    def drain():
        # file sink + checkpoint pair: resuming the checkpoint proves the
        # source replays only manifests beyond the recorded offset
        r = (
            spark.readStream.format("manifest").option("path", table).load()
            .writeStream.format("parquet")
            .option("path", sink).option("checkpointLocation", ck_r)
            .trigger(availableNow=True).start()
        )
        r.awaitTermination(120)
        assert r.exception() is None

    drain()
    first = spark.read.parquet(sink)
    assert first.count() == 120
    assert {r.id for r in first.collect()} == set(range(120))

    # a new commit lands; the tailing reader resumes from its checkpoint
    import pyarrow as pa
    import pyarrow.parquet as pq

    extra = spark.range(120, 150).toPandas()
    pq.write_table(pa.Table.from_pandas(extra), os.path.join(table, "part-x.parquet"))
    ManifestStreamWriter({"path": table}).commit(
        [FileCommit("part-x.parquet", 30, 0)], batchId=999
    )
    drain()
    out = spark.read.parquet(sink)
    # 150 not 270: the resumed reader emitted ONLY the new commit
    assert out.count() == 150
    assert {r.id for r in out.collect()} == set(range(150))
