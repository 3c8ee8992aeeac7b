"""interpolate_gaps edge semantics on a constructed spine: interior gaps
interpolate linearly (time-weighted), leading/trailing gaps carry the
nearest anchor, all-null keys stay null."""

from __future__ import annotations

import datetime as dt

from flight_radar_pipeline_spark.operators.temporal import interpolate_gaps


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_interior_leading_trailing(spark):
    rows = [
        # key a: anchors at h0 (10.0) and h3 (40.0); h1/h2 interpolate
        ("a", _ts(0), 10.0),
        ("a", _ts(1), None),
        ("a", _ts(2), None),
        ("a", _ts(3), 40.0),
        ("a", _ts(4), None),  # trailing → ffill 40.0
        # key b: leading gap then one anchor
        ("b", _ts(0), None),  # leading → bfill 7.0
        ("b", _ts(1), 7.0),
        # key c: never observed
        ("c", _ts(0), None),
        ("c", _ts(1), None),
    ]
    spine = spark.createDataFrame(rows, "k string, t timestamp, v double")
    got = {
        (r["k"], r["t"].hour): (r["v_filled"], r["fill_kind"])
        for r in interpolate_gaps(spine, "k", "t", "v").collect()
    }
    assert got[("a", 0)] == (10.0, "observed")
    assert got[("a", 1)] == (20.0, "interp")
    assert got[("a", 2)] == (30.0, "interp")
    assert got[("a", 3)] == (40.0, "observed")
    assert got[("a", 4)] == (40.0, "ffill")
    assert got[("b", 0)] == (7.0, "bfill")
    assert got[("b", 1)] == (7.0, "observed")
    assert got[("c", 0)] == (None, "empty")
    assert got[("c", 1)] == (None, "empty")


def test_irregular_spacing_is_time_weighted(spark):
    # anchors 1h and 4h: the 2h slot sits 1/3 of the way
    rows = [
        ("a", _ts(1), 0.0),
        ("a", _ts(2), None),
        ("a", _ts(4), 30.0),
    ]
    spine = spark.createDataFrame(rows, "k string, t timestamp, v double")
    got = {
        r["t"].hour: r["v_filled"]
        for r in interpolate_gaps(spine, "k", "t", "v").collect()
    }
    assert got[2] == 10.0
