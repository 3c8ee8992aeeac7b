"""Unit tests for bounded_min_cost (weighted k-hop Bellman-Ford) and
the mergeable equi-width histogram quantile sketch.

The battery entries prove both against DuckDB oracles on the testdata;
these tests hit the structural edges the uniform testdata can't: a
longer-but-cheaper path that only wins with enough relaxation rounds,
negative-free cycles, unreachable nodes, partials merged across an
arbitrary re-partitioning of the rows, out-of-range clamping, and
quantiles on single-bin groups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.graph import bounded_min_cost
from flight_radar_pipeline_spark.operators.sketches import (
    hist_partials,
    hist_quantiles,
    merge_hist_partials,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w bigint")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


def _costs(df):
    return {r["node"]: r["min_cost"] for r in df.collect()}


def test_min_cost_prefers_cheaper_long_path(spark):
    # a->z direct costs 10; a->b->c->z costs 3 but needs 3 hops.
    e = _edges(spark, [("a", "z", 10), ("a", "b", 1), ("b", "c", 1), ("c", "z", 1)])
    got2 = _costs(bounded_min_cost(e, _seeds(spark, ["a"]), 2))
    assert got2["z"] == 10  # within 2 hops the direct edge wins
    got3 = _costs(bounded_min_cost(e, _seeds(spark, ["a"]), 3))
    assert got3 == {"a": 0, "b": 1, "c": 2, "z": 3}


def test_min_cost_cycle_terminates_and_keeps_min(spark):
    e = _edges(spark, [("a", "b", 2), ("b", "a", 2), ("b", "c", 5)])
    got = _costs(bounded_min_cost(e, _seeds(spark, ["a"]), 4))
    # revisiting a through the cycle (cost 4) never beats its seed cost 0
    assert got == {"a": 0, "b": 2, "c": 7}


def test_min_cost_unreachable_absent_and_multi_seed_min(spark):
    e = _edges(spark, [("a", "m", 9), ("b", "m", 4), ("x", "y", 1)])
    got = _costs(bounded_min_cost(e, _seeds(spark, ["a", "b"]), 2))
    assert "x" not in got and "y" not in got
    assert got["m"] == 4  # min across seeds


def test_min_cost_zero_weight_edges(spark):
    e = _edges(spark, [("a", "b", 0), ("b", "c", 0)])
    got = _costs(bounded_min_cost(e, _seeds(spark, ["a"]), 2))
    assert got == {"a": 0, "b": 0, "c": 0}


# --------------------------------------------------------------------------
# histogram quantile sketch
# --------------------------------------------------------------------------


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, part int, v double")


def test_hist_partials_merge_is_partitioning_invariant(spark):
    rows = [("a", i % 3, float(i)) for i in range(100)]
    df = _vals(spark, rows)
    merged_split = merge_hist_partials(
        hist_partials(df, "v", ["g", "part"], 0.0, 100.0, 10), ["g"]
    )
    merged_whole = merge_hist_partials(
        hist_partials(df, "v", ["g"], 0.0, 100.0, 10), ["g"]
    )
    a = {(r["g"], r["bucket"]): r["bin_count"] for r in merged_split.collect()}
    b = {(r["g"], r["bucket"]): r["bin_count"] for r in merged_whole.collect()}
    assert a == b
    assert sum(a.values()) == 100


def test_hist_clamps_out_of_range(spark):
    df = _vals(spark, [("a", 0, -5.0), ("a", 0, 999.0), ("a", 0, 50.0)])
    m = merge_hist_partials(hist_partials(df, "v", ["g"], 0.0, 100.0, 10), ["g"])
    got = {r["bucket"]: r["bin_count"] for r in m.collect()}
    assert got == {0: 1, 9: 1, 5: 1}  # edge bins absorb, mass conserved


def test_hist_drops_nulls_not_bucket0(spark):
    # NULL values must vanish, not become phantom lo-edge mass (Spark's
    # greatest() skips nulls, so an unfiltered NULL lands in bucket 0).
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 0, 50.0), ("a", 0, None)],
        "g string, part int, v double",
    )
    m = merge_hist_partials(hist_partials(df, "v", ["g"], 0.0, 100.0, 10), ["g"])
    got = {r["bucket"]: r["bin_count"] for r in m.collect()}
    assert got == {5: 1}  # no bucket-0 phantoms; n excludes nulls


def test_hist_quantiles_uniform_interpolation(spark):
    # 100 values 0..99 in [0,100) x 10 bins: every bin holds 10; the
    # estimator is exact for the uniform case up to interpolation.
    df = _vals(spark, [("a", 0, float(i)) for i in range(100)])
    m = merge_hist_partials(hist_partials(df, "v", ["g"], 0.0, 100.0, 10), ["g"])
    q = hist_quantiles(m, ["g"], [0.5, 0.9], 0.0, 100.0, 10)
    got = {r["p"]: r["quantile"] for r in q.collect()}
    assert got[0.5] == pytest.approx(50.0)
    assert got[0.9] == pytest.approx(90.0)
    assert all(r["n"] == 100 for r in q.collect())


def test_hist_quantiles_single_bin_group(spark):
    df = _vals(spark, [("a", 0, 42.0)] * 7)
    m = merge_hist_partials(hist_partials(df, "v", ["g"], 0.0, 100.0, 10), ["g"])
    q = hist_quantiles(m, ["g"], [0.5], 0.0, 100.0, 10)
    row = q.collect()[0]
    # bucket 4 spans [40,50): estimate stays inside the occupied bin
    assert 40.0 <= row["quantile"] <= 50.0
    assert row["n"] == 7


def test_benford_second_digit_distribution(spark):
    """Second-digit expectations sum to 1 and are nearly flat
    (0.085–0.12); a Benford-conforming synthetic sample (exp-uniform
    magnitudes) lands a small chi2; digits cover 0..9."""
    import math

    from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash
    from flight_radar_pipeline_spark.operators.mining import (
        benford_second_digit_fit,
    )

    df = spark.range(20000).select(
        F.pow(F.lit(10.0), unit_hash(F.col("id"), "benf2") * 4).alias("amt")
    )
    rows = benford_second_digit_fit(df, "amt").collect()
    assert sorted(r.digit for r in rows) == list(range(10))
    s = sum(r.exp_freq for r in rows)
    assert abs(s - 1.0) < 1e-4
    for r in rows:
        assert 0.08 < r.exp_freq < 0.125
    chi2 = sum(r.chi2_term for r in rows)
    # 9 dof; a conforming sample should sit far below gross rejection
    assert chi2 < 40.0, chi2
