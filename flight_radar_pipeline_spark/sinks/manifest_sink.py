"""Manifest-committing sink via the Spark Python DataSource write API.

``df.write.format("manifest").mode("append"|"overwrite").option("path", d)``
writes one parquet file per task plus a driver-side ``_MANIFEST.json``
recording, for every file, its row count and an order-independent
checksum (the ``orders_table_checksum`` construction: md5 row hashes
summed mod 2^62). The commit protocol is the point:

- each task writes to a UUID-named file and returns a
  ``WriterCommitMessage`` carrying (file, rows, checksum) — nothing is
  visible to readers yet;
- ``commit()`` runs ONCE on the driver with every task's message and
  writes the manifest LAST — the manifest is the atomic publication
  point, so readers that require it never observe a partial write;
- ``abort()`` leaves orphan files that a later overwrite's manifest
  simply does not reference (the cheap object-store recovery model —
  no renames, no directory listing on the read path).

A downstream auditor re-derives each file's checksum and compares with
the manifest (``verify_manifest``) — corruption or loss localizes to a
file. This is the engine-portable skeleton of what table formats do
with real transaction logs.

Scale posture: task output streams through a chunked ParquetWriter
(``batch_rows`` rows per row group — bounded task memory at any
partition size); the driver holds one small message per task.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_MOD = 4611686018427387904  # 2^62


def _atomic_write_json(path: str, obj: dict) -> None:
    """Publish a manifest atomically: write to a same-directory temp file,
    fsync, then ``os.rename`` onto the final name (atomic on POSIX). A
    crash mid-write leaves only an orphaned ``.tmp`` — the final path is
    either absent or a COMPLETE manifest, so replay-idempotence checks
    (``os.path.exists``) and readers (``json.load``) never observe a
    truncated file."""
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)


def _row_hash(vals: tuple) -> int:
    rendered = "|".join("" if v is None else str(v) for v in vals)
    return int(hashlib.md5(rendered.encode()).hexdigest()[:15], 16)


class FileCommit(WriterCommitMessage):
    def __init__(self, file: str, rows: int, checksum: int):
        self.file, self.rows, self.checksum = file, rows, checksum


def _write_parquet_task(path: str, iterator: Iterator, batch_rows: int) -> FileCommit:
    """One task's write: stream rows into a UUID-named parquet file in
    ``batch_rows`` row groups (bounded task memory at any partition size),
    returning the (file, rows, checksum) commit message. Shared verbatim by
    the batch and streaming writers — the commit PROTOCOL differs, the task
    write does not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    name = f"part-{uuid.uuid4().hex}.parquet"
    os.makedirs(path, exist_ok=True)
    writer = None
    batch, total, checksum = [], 0, 0
    try:
        for row in iterator:
            batch.append(row.asDict())
            checksum = (checksum + _row_hash(tuple(row))) % _MOD
            total += 1
            if len(batch) >= batch_rows:
                table = pa.Table.from_pylist(batch)
                if writer is None:
                    writer = pq.ParquetWriter(os.path.join(path, name), table.schema)
                writer.write_table(table)
                batch = []
        if batch:
            table = pa.Table.from_pylist(batch)
            if writer is None:
                writer = pq.ParquetWriter(os.path.join(path, name), table.schema)
            writer.write_table(table)
    finally:
        if writer is not None:
            writer.close()
    return FileCommit(name if total else "", total, checksum)


class ManifestWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        # rows buffered per parquet row group — bounds task memory at any
        # partition size (the "streams through pyarrow" claim, literally)
        self.batch_rows = int(options.get("batch_rows", "65536"))

    def write(self, iterator: Iterator) -> FileCommit:
        return _write_parquet_task(self.path, iterator, self.batch_rows)

    def commit(self, messages) -> None:
        entries = [
            {"file": m.file, "rows": m.rows, "checksum": m.checksum}
            for m in messages
            if m.file
        ]
        manifest = {
            "files": sorted(entries, key=lambda e: e["file"]),
            "total_rows": sum(e["rows"] for e in entries),
        }
        mpath = os.path.join(self.path, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(mpath):
            with open(mpath) as fh:
                prev = json.load(fh)
            manifest["files"] = sorted(
                prev["files"] + manifest["files"], key=lambda e: e["file"]
            )
            manifest["total_rows"] = sum(
                e["rows"] for e in manifest["files"]
            )
        _atomic_write_json(mpath, manifest)

    def abort(self, messages) -> None:  # pragma: no cover - failure path
        # orphaned part files are unreferenced by any manifest; a later
        # overwrite commit supersedes them
        pass


def _batch_manifest_name(batch_id: int) -> str:
    return f"_MANIFEST-{batch_id:010d}.json"


class ManifestStreamWriter(DataSourceStreamWriter):
    """Streaming flavor of the manifest sink: one manifest PER MICROBATCH
    (``_MANIFEST-<batchId>.json``), committed by the driver after every
    task's message for that batch arrives — the same publish-last protocol,
    repeated per trigger.

    Exactly-once across restarts comes from the manifest being the
    publication point: when a crash lands between the sink commit and the
    checkpoint write, Spark REPLAYS the batch (same batchId, re-run tasks,
    fresh UUID part files). ``commit`` sees the batch's manifest already on
    disk and does nothing — the first manifest stands, the replay's files
    stay orphaned and unreferenced, and readers (which resolve through
    manifests only) never see duplicates. Same replay posture as
    ``streaming.events.idempotent_rollup_merge``, enforced at the
    DataSource layer instead of inside a foreachBatch."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batch_rows", "65536"))

    def write(self, iterator: Iterator) -> FileCommit:
        return _write_parquet_task(self.path, iterator, self.batch_rows)

    def commit(self, messages, batchId: int) -> None:
        mpath = os.path.join(self.path, _batch_manifest_name(batchId))
        if os.path.exists(mpath):
            return  # replayed batch — first commit already published
        entries = [
            {"file": m.file, "rows": m.rows, "checksum": m.checksum}
            for m in messages
            if m.file
        ]
        manifest = {
            "batch_id": batchId,
            "files": sorted(entries, key=lambda e: e["file"]),
            "total_rows": sum(e["rows"] for e in entries),
        }
        _atomic_write_json(mpath, manifest)

    def abort(self, messages, batchId: int) -> None:  # pragma: no cover
        pass  # unreferenced part files; next trigger's commit supersedes


def _referenced_files(path: str) -> list[str]:
    """Every file any manifest references (batch ``_MANIFEST.json`` +
    streaming per-batch manifests) — the table's committed contents.
    Orphans from aborted/replayed writes are in the directory but in no
    manifest, so they are invisible here."""
    files: list[str] = []
    if os.path.exists(os.path.join(path, "_MANIFEST.json")):
        files += [e["file"] for e in read_manifest(path)["files"]]
    for n in sorted(os.listdir(path)):
        if n.startswith("_MANIFEST-") and n.endswith(".json"):
            files += [e["file"] for e in read_manifest(path, n)["files"]]
    return files


class ManifestReader(DataSourceReader):
    """Read side of the commit protocol: resolve the file list through the
    manifests, one InputPartition per referenced file, rows produced as
    Arrow RecordBatches (the Python DataSource fast path). A directory
    glob would also read orphans from aborted or replayed writes — the
    manifest IS the table."""

    def __init__(self, options: dict):
        self.path = options["path"]
        self.files = _referenced_files(self.path)

    def partitions(self):
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(
            os.path.join(self.path, partition.value)
        ).iter_batches()


def _stream_manifest_names(path: str) -> list[str]:
    return sorted(
        n
        for n in os.listdir(path)
        if n.startswith("_MANIFEST-") and n.endswith(".json")
    )


class ManifestStreamReader(DataSourceStreamReader):
    """Tail the manifest log as a streaming source: the offset is the
    COUNT of per-batch manifests present, so each trigger reads exactly
    the files committed by manifests [start, end) — one InputPartition per
    newly-referenced file, Arrow RecordBatch output.

    This is table-tailing CDC over the sink's own commit protocol: a
    manifest is written atomically AFTER its data files, so a reader that
    observes manifest N can always read every file it references, and
    orphans (crash-replay leftovers) never enter the stream because they
    are in no manifest. Writes and reads can run concurrently — a
    write-stream publishing manifests while a read-stream tails them is
    exactly-once end to end (both sides checkpoint independently)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"manifests": 0}

    def latestOffset(self) -> dict:
        return {"manifests": len(_stream_manifest_names(self.path))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        names = _stream_manifest_names(self.path)[start["manifests"] : end["manifests"]]
        return [
            InputPartition(e["file"])
            for n in names
            for e in read_manifest(self.path, n)["files"]
        ]

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(
            os.path.join(self.path, partition.value)
        ).iter_batches()

    def commit(self, end: dict) -> None:
        pass  # progress lives in the query checkpoint, not the source


class ManifestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow.parquet as pq

        files = _referenced_files(self.options["path"])
        if not files:
            raise ValueError(
                "manifest table has no committed files "
                f"(no manifest under {self.options['path']!r})"
            )
        footer = pq.ParquetFile(
            os.path.join(self.options["path"], files[0])
        ).schema_arrow
        return from_arrow_schema(footer)

    def reader(self, schema) -> ManifestReader:
        return ManifestReader(self.options)

    def writer(self, schema, overwrite: bool) -> ManifestWriter:
        return ManifestWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> ManifestStreamWriter:
        return ManifestStreamWriter(self.options)

    def streamReader(self, schema) -> ManifestStreamReader:
        return ManifestStreamReader(self.options)


def read_manifest_table(spark, path: str):
    """Production read path: hand Spark the manifest-resolved file list as
    a NATIVE parquet scan (full codegen, pushdown, vectorization — the
    Python DataSource reader exists for API completeness and small
    tables). Readers must never glob the directory: orphans from
    aborted/replayed writes are not part of the table."""
    files = _referenced_files(path)
    if not files:
        raise ValueError(f"manifest table has no committed files under {path!r}")
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def read_manifest(path: str, name: str = "_MANIFEST.json") -> dict:
    with open(os.path.join(path, name)) as fh:
        return json.load(fh)


def read_stream_manifests(path: str) -> dict:
    """Merge every per-batch manifest into one view: the reader-side
    resolution for the streaming sink ({"files", "total_rows",
    "batch_ids"}). Files a crashed/replayed batch left unreferenced are
    invisible here by construction."""
    names = sorted(
        n
        for n in os.listdir(path)
        if n.startswith("_MANIFEST-") and n.endswith(".json")
    )
    files, batch_ids = [], []
    for n in names:
        m = read_manifest(path, n)
        files.extend(m["files"])
        batch_ids.append(m["batch_id"])
    return {
        "files": sorted(files, key=lambda e: e["file"]),
        "total_rows": sum(e["rows"] for e in files),
        "batch_ids": batch_ids,
    }


def verify_manifest(path: str, manifest: dict | None = None) -> dict:
    """Re-derive every referenced file's (rows, checksum) and diff against
    the manifest → {"ok": bool, "mismatches": [...], "missing": [...]}.
    Pass ``manifest=read_stream_manifests(path)`` to audit a streaming
    sink's merged view instead of the batch ``_MANIFEST.json``."""
    import pyarrow.parquet as pq

    if manifest is None:
        manifest = read_manifest(path)
    mismatches, missing = [], []
    for entry in manifest["files"]:
        fpath = os.path.join(path, entry["file"])
        if not os.path.exists(fpath):
            missing.append(entry["file"])
            continue
        table = pq.read_table(fpath)
        checksum, rows = 0, table.num_rows
        cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
        for vals in zip(*cols):
            checksum = (checksum + _row_hash(vals)) % _MOD
        if rows != entry["rows"] or checksum != entry["checksum"]:
            mismatches.append(entry["file"])
    return {
        "ok": not mismatches and not missing,
        "mismatches": mismatches,
        "missing": missing,
    }
