"""Structural invariants of the SCD2 history the stream merge maintains
— properties the hash oracle implies but never states: per key, validity
intervals are non-overlapping and chained (each row's valid_to equals
the next row's valid_from), exactly one current row exists, and a key
updated in both waves carries exactly three versions."""

from __future__ import annotations

from collections import defaultdict

import pytest


@pytest.fixture(scope="module")
def history(spark):
    from flight_radar_pipeline_spark.plans.battery_lake import (
        orders_scd2_stream_merge,
    )

    return orders_scd2_stream_merge(spark, "/root/testdata/sf0.001").collect()


def test_intervals_chain_without_overlap(history):
    by_key = defaultdict(list)
    for r in history:
        by_key[r["o_orderkey"]].append((r["valid_from"], r["valid_to"]))
    for key, ivs in by_key.items():
        ivs.sort()
        for (f1, t1), (f2, _t2) in zip(ivs, ivs[1:]):
            assert t1 == f2, f"key {key}: gap or overlap between {t1} and {f2}"
            assert f1 < t1, f"key {key}: empty/inverted interval"


def test_exactly_one_current_row_per_key(history):
    current = defaultdict(int)
    for r in history:
        if r["is_current"]:
            current[r["o_orderkey"]] += 1
            assert r["valid_to"] == "9999-12-31 00:00:00"
    keys = {r["o_orderkey"] for r in history}
    assert set(current) == keys
    assert all(n == 1 for n in current.values())


def test_version_counts_match_update_waves(history):
    counts = defaultdict(int)
    for r in history:
        counts[r["o_orderkey"]] += 1
    for key, n in counts.items():
        expected = 3 if key % 20 == 0 else 2 if key % 10 == 0 else 1
        assert n == expected, f"key {key}: {n} versions, expected {expected}"
