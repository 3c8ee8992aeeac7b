"""Accuracy pin for the rows-only ``approx_distinct_users`` battery entry.

The HLL estimate has no SQL oracle (engine-specific sketch), so the driver
records a weaker rows-only check. This test closes the hole: on real test
data the estimate must sit within a small multiple of the configured 5% rsd
of the exact count (HLL++ error is probabilistic; 5× rsd ≈ 5 sigma leaves
effectively zero flake probability while still catching a broken sketch).
"""

from __future__ import annotations

import os

import pytest

from flight_radar_pipeline_spark.plans import battery, battery_ext  # noqa: F401 (registers specs)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"), reason="testdata not present"
)


def test_hll_estimate_within_rsd(spark):
    rows = battery.REGISTRY["approx_distinct_users"].build(spark, SF_DIR).collect()
    assert rows, "no event types found"
    for r in rows:
        exact = r.exact_users
        assert exact > 0
        rel_err = abs(r.approx_users - exact) / exact
        assert rel_err <= 0.25, (
            f"{r.event_type}: approx={r.approx_users} exact={exact} "
            f"rel_err={rel_err:.4f} exceeds 5x the configured 5% rsd"
        )


def test_hll_sketches_merge_losslessly(spark):
    """The 100 TB rollup property, on the real API: daily
    ``hll_sketch_agg`` sketches unioned with ``hll_union_agg`` estimate
    EXACTLY what one sketch over all the data estimates — HLL union
    max-merges registers, so sketch-of-union ≡ union-of-sketches
    independent of how the data was split. This is what makes
    pre-aggregated distinct-count rollup tables sound: store one small
    sketch per (day, key), answer any date range by union."""
    from pyspark.sql import functions as F

    from flight_radar_pipeline_spark.sources.readers import load_table

    events = load_table(spark, SF_DIR, "events")
    daily = events.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    rolled = (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .orderBy("event_type")
        .collect()
    )
    direct = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .orderBy("event_type")
        .collect()
    )
    assert [(r.event_type, r.est) for r in rolled] == [
        (r.event_type, r.est) for r in direct
    ]
