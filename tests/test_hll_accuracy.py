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
