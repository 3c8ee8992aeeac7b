"""Partitioned batch sinks + snapshot resolution.

Replaces the reference's hand-built date-bucketed path strings and
driver-side listing (``/root/reference/src/load.py:20-81`` K2/K3,
``/root/reference/src/answers.py:196-203`` S8 — SURVEY.md §2.1-§2.2) with
native partitioned writes and partition-value pruning:

- ``write_partitioned`` — one writer, ``partitionBy`` on real columns
  derived in-plan (``year/month/day`` from a timestamp), so readers prune
  partitions from predicates instead of parsing path strings.
- ``write_single_csv`` — the reference's K1 ``coalesce(1)`` CSV sink, kept
  only for small dimension tables (coalescing a fact to 1 task is the
  canonical scale mistake; guarded by ``max_rows``).
- ``latest_snapshot`` — replaces lexicographic object listing with a
  partition-column max + filter: Spark reads only partition metadata for
  the max, then scans just the winning partition.

Scale: the partitioned writer sets ``maxRecordsPerFile`` so a skewed day
cannot produce a multi-GB file. Rerun semantics are explicit, not
accidental: ``run_id`` stamps every appended row with its producing run
(so a retry's duplicates are distinguishable and dedupable), and
``dynamic_overwrite`` switches to dynamic partition overwrite — the
rerun replaces exactly the partitions it writes, leaving the rest of the
table untouched (the idempotent choice for backfills/retries; wrong for
intra-day incremental appends, which would clobber the day's earlier
batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATE_PARTS = ("year", "month", "day")


def with_date_parts(df: DataFrame, ts_col: str = "time") -> DataFrame:
    """Derive year/month/day partition columns from a timestamp column
    (in-plan; replaces load.py's strftime'd path strings)."""
    t = F.col(ts_col).cast("timestamp")
    return (
        df.withColumn("year", F.year(t))
        .withColumn("month", F.month(t))
        .withColumn("day", F.dayofmonth(t))
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "time",
    fmt: str = "parquet",
    mode: str = "append",
    max_records_per_file: int = 5_000_000,
    run_id: str | None = None,
    dynamic_overwrite: bool = False,
) -> None:
    """Date-partitioned write (K2/K3 equivalent): Parquet or CSV, real
    partition columns, bounded file sizes.

    ``run_id`` (if given) is stamped as a column so appended rows carry
    their producing run — a crashed-and-retried run's duplicates are then
    dedupable (``row_number() over (partition by key order by run_id
    desc)``) instead of silently indistinguishable. ``dynamic_overwrite``
    replaces only the partitions present in ``df`` (Spark's dynamic
    partition overwrite), making a rerun of the same input byte-idempotent
    on storage."""
    out = with_date_parts(df, ts_col)
    if run_id is not None:
        out = out.withColumn("run_id", F.lit(run_id))
    writer = out.write.partitionBy(*DATE_PARTS).option(
        "maxRecordsPerFile", max_records_per_file
    )
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic").mode("overwrite")
    else:
        writer = writer.mode(mode)
    writer.format(fmt).save(path)


def write_single_csv(df: DataFrame, path: str, max_rows: int = 1_000_000) -> None:
    """Single-file CSV sink (K1) for small dimensions only. Refuses large
    inputs — coalesce(1) on a fact table serializes the whole write through
    one task."""
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"write_single_csv is for small dimensions (> {max_rows} rows); "
            "use write_partitioned"
        )
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(path)


def write_if_absent(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Idempotent dimension write (SURVEY §2.1 S9): the reference probes the
    bucket for a ``_SUCCESS`` marker driver-side before deciding to extract
    (``/root/reference/src/main.py:42-45``); Spark's ``mode("ignore")`` is
    the same skip-if-output-exists semantics enforced at the committer, with
    no listing race."""
    df.write.mode("ignore").format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
) -> None:
    """Bucketed + sorted ``saveAsTable``: co-locates join keys at write
    time, so equi-joins between tables bucketed the same way on the same
    column plan as Exchange-free sort-merge joins — the shuffle is paid
    once at write, not on every query. The canonical layout for a fact
    table joined repeatedly on one key at 100 TB (pick ``num_buckets`` ≈
    cluster cores × small factor; both sides must match)."""
    (
        df.write.bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    domains: list[tuple[float, float]],
    bits: int = 8,
    target_records_per_file: int = 1_000_000,
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key of ``cols`` so row-group min/max statistics prune
    predicates on EVERY clustered column (the Delta/Iceberg ``OPTIMIZE
    ZORDER BY`` layout, measured in ``tools/zorder_bench.py`` /
    BASELINE.md: a one-column sort is blind off-column; z-order prunes
    all dimensions, halving the worst case). Columns are cast to double
    for quantization (timestamps become epoch seconds — size ``domains``
    accordingly). Requires the session's ``TIMESTAMP_MICROS`` output
    (INT96 carries no statistics)."""
    from flight_radar_pipeline_spark.operators.zorder import zorder_key

    key = zorder_key([F.col(c).cast("double") for c in cols], domains, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .parquet(path)
    )


def latest_snapshot(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read only the most recent (year, month, day) partition (S8
    equivalent). The max() pass touches partition metadata only (partition
    columns come from directory names, no data files read); the returned
    scan is pruned to that one partition."""
    full = spark.read.format(fmt).load(path)
    latest = (
        full.select(*DATE_PARTS)
        .distinct()
        .orderBy(F.desc("year"), F.desc("month"), F.desc("day"))
        .limit(1)
        .collect()[0]
    )
    return full.filter(
        (F.col("year") == latest["year"])
        & (F.col("month") == latest["month"])
        & (F.col("day") == latest["day"])
    )


def compact_dataset(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    target_records_per_file: int = 1_000_000,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction: rewrite a dataset so each file holds up to
    ``target_records_per_file`` rows → {"files_before", "files_after",
    "rows"}.

    The operational problem: incremental appends (per-batch, per-stream-
    trigger) accumulate thousands of KB-sized files per partition, and at
    100 TB scan cost becomes file-open dominated (driver-side listing,
    footer reads, no row-group parallelism). The rewrite clusters rows
    back into full files: partitioned data repartitions by its partition
    columns so each partition lands in the fewest tasks; unpartitioned
    data repartitions into ceil(rows/target) even chunks;
    ``maxRecordsPerFile`` caps file size either way.

    Spark refuses to overwrite a path its own plan is reading, so the
    rewrite goes to a sibling temp directory and swaps in via two
    filesystem renames (driver metadata ops only — no data movement on a
    real object store with directory semantics; on S3-like stores use a
    committer/table format for the swap). File counts come from
    ``input_file_name`` — no driver directory walking.
    """
    import math

    df = spark.read.format(fmt).load(path)
    rows = df.count()
    files_before = (
        df.select(F.input_file_name().alias("__f")).distinct().count()
    )

    base = path.rstrip("/")
    tmp, old = base + ".compact-tmp", base + ".compact-old"
    writer = (
        df.repartition(*[F.col(c) for c in partition_cols])
        if partition_cols
        else df.repartition(max(1, math.ceil(rows / target_records_per_file)))
    ).write.format(fmt).mode("overwrite").option(
        "maxRecordsPerFile", target_records_per_file
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(tmp)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(conf)
    hpath = jvm.org.apache.hadoop.fs.Path
    fs.rename(hpath(base), hpath(old))
    fs.rename(hpath(tmp), hpath(base))
    fs.delete(hpath(old), True)

    compacted = spark.read.format(fmt).load(path)
    files_after = (
        compacted.select(F.input_file_name().alias("__f")).distinct().count()
    )
    return {"files_before": files_before, "files_after": files_after, "rows": rows}
