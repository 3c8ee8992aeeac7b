"""RocksDB state store: the production provider for large streaming
state. Same results as the default HDFS-backed provider on real stateful
entries (windowed aggregation and a stream-stream join with watermark
eviction), and conf restoration on context exit."""

from __future__ import annotations

import __spark_entry__ as entrymod
from flight_radar_pipeline_spark.streaming.events import (
    ROCKSDB_STATE_PROVIDER,
    rocksdb_state,
)

SF_DIR = "/root/testdata/sf0.001"

PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    return sorted(tuple(r) for r in df.collect())


def test_rocksdb_matches_default_provider_on_stateful_entries(spark):
    for name in ("hourly_event_counts_stream", "click_view_pairs_stream"):
        baseline = _run(spark, name)
        with rocksdb_state(spark):
            assert spark.conf.get(PROVIDER_KEY) == ROCKSDB_STATE_PROVIDER
            got = _run(spark, name)
        assert got == baseline, name
        assert len(baseline) > 0


def test_rocksdb_context_restores_prior_conf(spark):
    before = spark.conf.get(PROVIDER_KEY, None)
    with rocksdb_state(spark):
        assert spark.conf.get(PROVIDER_KEY) == ROCKSDB_STATE_PROVIDER
    assert spark.conf.get(PROVIDER_KEY, None) == before
