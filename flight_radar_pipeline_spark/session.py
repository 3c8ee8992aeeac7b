"""SparkSession factory.

Replaces the reference's hand-rolled context manager
(``/root/reference/src/main.py:68-102``) with a configurable builder that is
correct in local test mode and sane on a large cluster:

- AQE on (coalesced shuffle partitions, skew-join splitting) — the runtime
  re-planner that keeps a fixed ``shuffle.partitions`` from being wrong at
  either 60k rows or 100 TB.
- Arrow enabled for any pandas interchange (vectorized ``mapInPandas`` path).
- Session timezone pinned (default ``Europe/Paris`` for golden parity with
  the reference's ``from_unixtime`` strings, ``src/transform.py:189-192``;
  tests against the DuckDB oracle pin UTC instead so naive-timestamp
  semantics agree across engines).
- Parquet filter pushdown / column pruning left on (Catalyst defaults) —
  queries are built as single lazy plans so pruning reaches the scan.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import SparkSession

# Defaults chosen for the local[NCPU] test harness; on a real cluster the
# deploy environment overrides master/shuffle via env or extra_conf.
_ENV_CPUS = "SPARK_GRAFT_CPUS"
_ENV_MASTER = "SPARK_GRAFT_MASTER"


def default_parallelism() -> int:
    cpus = os.environ.get(_ENV_CPUS)
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark_session(
    app_name: str = "flight-radar-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    timezone: str = "Europe/Paris",
    extra_conf: Mapping[str, str] | None = None,
    s3a: Mapping[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``s3a`` — optional object-store connection block (endpoint/access/secret),
    mirroring the reference's MinIO wiring (``src/main.py:76-92``) without
    hardcoding any deployment; see :func:`s3a_conf`.
    """
    master = master or os.environ.get(_ENV_MASTER) or f"local[{default_parallelism()}]"
    builder = SparkSession.builder.appName(app_name).master(master)

    conf: dict[str, str] = {
        "spark.sql.session.timeZone": timezone,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # local test default; AQE coalesces down, cluster deploys override up
        "spark.sql.shuffle.partitions": str(shuffle_partitions or default_parallelism()),
        "spark.sql.parquet.filterPushdown": "true",
        # Spark's default INT96 parquet timestamps carry NO row-group
        # min/max statistics, silently disabling time-based data skipping
        # on everything this engine writes (measured: tools/zorder_bench.py
        # — a time predicate on an INT96 layout reads every row group).
        # INT64 micros is also what modern readers (DuckDB, Iceberg,
        # Delta) expect.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # the synthetic events table carries parquet TIMESTAMP(NANOS),
        # which Spark rejects unless read as int64 (sources/readers.py
        # converts back to a timestamp)
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if s3a:
        conf.update(s3a_conf(**s3a))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def s3a_conf(
    endpoint: str,
    access_key: str,
    secret_key: str,
    ssl: bool = False,
    magic_committer: bool = True,
) -> dict[str, str]:
    """Hadoop S3A configuration block for an S3-compatible object store.

    Functional equivalent of the reference's MinIO block
    (``/root/reference/src/main.py:76-92``): path-style access + the magic
    committer (no rename-on-S3 commit penalty).
    """
    conf = {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": "true",
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(ssl).lower(),
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }
    if magic_committer:
        conf.update(
            {
                "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
                "spark.hadoop.fs.s3a.committer.name": "magic",
                "spark.sql.sources.commitProtocolClass": (
                    "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
                ),
                "spark.sql.parquet.output.committer.class": (
                    "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
                ),
            }
        )
    return conf
