"""The two ledger folds (copy-on-write vs round-11's delta/merge-on-read)
must be EXCHANGEABLE: for any mergeable integer increment, both produce
the identical final state from the same waves. The W₁ entry's oracle
match proves it for one caller; this pins the harness-level contract so
any future caller can switch folds knowing only performance changes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.sources.readers import load_table
from flight_radar_pipeline_spark.streaming.ledger import (
    chronological_thirds,
    fold_chronological_waves,
    fold_chronological_waves_delta,
)

SF_DIR = "/root/testdata/sf0.001"


def _increment(batch):
    return batch.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )


def _merge(old, inc):
    return (
        old.unionByName(inc)
        .groupBy("user_id", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )


def test_delta_fold_equals_copy_on_write_fold(spark):
    ev = load_table(spark, SF_DIR, "events")
    waves, _mid = chronological_thirds(ev)
    cow = fold_chronological_waves(
        spark, waves, _increment, _merge, prefix="ledger_cow_"
    )
    delta = fold_chronological_waves_delta(
        spark, waves, _increment, _merge, prefix="ledger_delta_"
    )
    a = sorted(tuple(r) for r in cow.collect())
    b = sorted(tuple(r) for r in delta.collect())
    assert a == b
    # and both equal the from-scratch batch aggregate (merge-exactness)
    direct = sorted(tuple(r) for r in _increment(ev).collect())
    assert a == direct


def test_delta_fold_single_wave_degenerate(spark):
    """One wave: the delta fold's merge-on-read must still apply the
    final aggregate (a single delta file is already at the state grain,
    but the contract is agnostic to that)."""
    ev = load_table(spark, SF_DIR, "events")
    out = fold_chronological_waves_delta(
        spark, [ev], _increment, _merge, prefix="ledger_single_"
    )
    direct = sorted(tuple(r) for r in _increment(ev).collect())
    assert sorted(tuple(r) for r in out.collect()) == direct


def test_stage_waves_one_file_per_wave_mtimes_ascending(spark, tmp_path):
    """The round-13 single-job staging must keep the replay contract:
    exactly one data file per wave, flat names 000.parquet…, strictly
    ascending TARGET mtimes, and per-wave contents identical (as sets)
    to the wave frames — including a 0-row wave, which the dynamic
    partition write would otherwise drop from the replay."""
    import os

    from flight_radar_pipeline_spark.streaming.ledger import stage_waves

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_type")
    waves = [
        ev.filter(F.col("user_id") % 3 == 0),
        ev.filter(F.lit(False)),  # empty wave
        ev.filter(F.col("user_id") % 3 != 0),
    ]
    flat = stage_waves(str(tmp_path), waves)
    names = sorted(os.listdir(flat))
    assert names == ["000.parquet", "001.parquet", "002.parquet"]
    mtimes = [os.stat(os.path.join(flat, n)).st_mtime for n in names]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    for i, n in enumerate(names):
        got = spark.read.parquet(os.path.join(flat, n))
        assert got.schema == waves[i].schema
        assert (
            got.exceptAll(waves[i]).count() == 0
            and waves[i].exceptAll(got).count() == 0
        )
