"""Unit tests for time_respecting_reach (back-in-time paths excluded,
earliest-arrival propagation, waiting allowed) and the mergeable moment
partials (merge ≡ direct on random slices, degenerate slice shapes).
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from flight_radar_pipeline_spark.operators.graph import time_respecting_reach
from flight_radar_pipeline_spark.operators.sketches import (
    merge_moment_partials,
    moment_partials,
)


def _ts(day: int):
    return dt.datetime(2024, 1, day)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, ts timestamp")


def _seeds(spark, rows):
    return spark.createDataFrame(rows, "node string, ts0 timestamp")


def test_temporal_reach_excludes_back_in_time_paths(spark):
    # a→b on day 5, b→c on day 3: b is reached (hop 1, arrival day 5)
    # but c is NOT — the only edge into c departs before b's arrival.
    e = _edges(spark, [("a", "b", _ts(5)), ("b", "c", _ts(3))])
    s = _seeds(spark, [("a", _ts(1))])
    got = {r.node: (r.hop, r.arrival) for r in time_respecting_reach(e, s, 3).collect()}
    assert set(got) == {"a", "b"}
    assert got["b"] == (1, _ts(5))


def test_temporal_reach_waiting_is_allowed(spark):
    # a→b day 2, b→c day 9: waiting at b for a week is fine (ts ≥ arrival)
    e = _edges(spark, [("a", "b", _ts(2)), ("b", "c", _ts(9))])
    s = _seeds(spark, [("a", _ts(1))])
    got = {r.node: (r.hop, r.arrival) for r in time_respecting_reach(e, s, 3).collect()}
    assert got["c"] == (2, _ts(9))


def test_temporal_reach_picks_earliest_arrival(spark):
    # two time-valid routes into c at hop 2: via b1 (arrives day 4) and
    # via b2 (arrives day 8) — the frontier must carry day 4.
    e = _edges(spark, [
        ("a", "b1", _ts(2)), ("b1", "c", _ts(4)),
        ("a", "b2", _ts(3)), ("b2", "c", _ts(8)),
    ])
    s = _seeds(spark, [("a", _ts(1))])
    got = {r.node: (r.hop, r.arrival) for r in time_respecting_reach(e, s, 2).collect()}
    assert got["c"] == (2, _ts(4))


def test_temporal_reach_seed_start_filters_first_hop(spark):
    # seed can't use edges departing before its ts0
    e = _edges(spark, [("a", "b", _ts(2)), ("a", "c", _ts(9))])
    s = _seeds(spark, [("a", _ts(5))])
    got = {r.node for r in time_respecting_reach(e, s, 1).collect()}
    assert got == {"a", "c"}


@pytest.mark.parametrize("seed", [11, 42])
def test_moment_merge_equals_direct(spark, seed):
    rng = np.random.default_rng(seed)
    rows = [
        (f"g{int(rng.integers(0, 3))}", int(rng.integers(0, 5)),
         float(rng.normal(100, 15)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, slice long, v double")
    partials = moment_partials(df, ["g", "slice"], "v")
    merged = {
        r.g: (r.n, r.mean, r.m2)
        for r in merge_moment_partials(partials, ["g"], ["slice"]).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, _sl, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        n, mean, m2 = merged[g]
        assert n == len(vs)
        assert math.isclose(mean, float(np.mean(vs)), rel_tol=1e-9)
        assert math.isclose(
            m2 / (n - 1), float(np.var(vs, ddof=1)), rel_tol=1e-7
        )


def test_moment_m2_never_negative_under_cancellation(spark):
    # large mean, tiny variance: Σx² − n·mean² cancels catastrophically
    # and can come out slightly negative in doubles — the clamp must
    # keep m2 ≥ 0 so variance/std stay finite downstream.
    base = 1.0e9
    rows = [("g", 0, base + i * 1e-4) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, slice long, v double")
    out = moment_partials(df, ["g", "slice"], "v").collect()[0]
    assert out.m2 >= 0.0
    merged = merge_moment_partials(
        moment_partials(df, ["g", "slice"], "v"), ["g"], ["slice"]
    ).collect()[0]
    assert merged.m2 >= 0.0
    assert math.isfinite(math.sqrt(merged.m2 / (merged.n - 1)))


def test_moment_merge_single_and_tiny_slices(spark):
    # a group whose slices hold 1 value each (m2 = 0 per slice) must
    # still produce the exact pooled variance
    rows = [("g", i, float(v)) for i, v in enumerate([2.0, 4.0, 6.0, 8.0])]
    df = spark.createDataFrame(rows, "g string, slice long, v double")
    partials = moment_partials(df, ["g", "slice"], "v")
    out = merge_moment_partials(partials, ["g"], ["slice"]).collect()[0]
    assert out.n == 4
    assert math.isclose(out.mean, 5.0, rel_tol=1e-12)
    assert math.isclose(out.m2 / 3, float(np.var([2, 4, 6, 8], ddof=1)), rel_tol=1e-9)


# --------------------------------------------------------------------------
# KMV partial mergeability (split invariance)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("seed,n_splits", [(5, 2), (29, 4)])
def test_kmv_merge_invariant_to_split(spark, seed, n_splits):
    """Merging per-slice KMV partials must equal the partial computed
    over the whole data, for ANY split — including keys repeating
    across slices."""
    from flight_radar_pipeline_spark.operators.sketches import (
        kmv_partials,
        merge_kmv_partials,
    )

    rng = np.random.default_rng(seed)
    k = 8
    rows = [
        (f"g{int(rng.integers(0, 3))}", int(rng.integers(0, 200)),
         int(rng.integers(0, n_splits)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, key long, split long")
    direct = kmv_partials(df, ["g"], "key", k)
    per_slice = kmv_partials(df, ["g", "split"], "key", k).drop("split")
    merged = merge_kmv_partials(per_slice, ["g"], k)
    got_direct = {r.g: [(x.hv, x.user_id) for x in r["__mins"]] for r in direct.collect()}
    got_merged = {r.g: [(x.hv, x.user_id) for x in r["__mins"]] for r in merged.collect()}
    assert got_direct == got_merged
