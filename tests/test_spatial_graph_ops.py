"""Unit tests for the round-6 operator additions: grid-cell proximity
(guard rails + exactness vs a brute-force pairing), bounded BFS reach
(hop minimality, seed handling, frontier termination), and interval
overlap banding (count-once across bucket-straddling overlaps).

The battery entries prove these against naive DuckDB oracles on the
testdata; these tests hit the edges the uniform testdata can't —
latitude guard violations, unreachable nodes, cycles, intervals spanning
many buckets, zero-length and touching intervals.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.graph import n_hop_reach
from flight_radar_pipeline_spark.operators.spatial import geo_cell_pairs
from flight_radar_pipeline_spark.operators.temporal import interval_overlap_pairs


# --------------------------------------------------------------------------
# geo_cell_pairs
# --------------------------------------------------------------------------

def _points(spark, rows):
    return spark.createDataFrame(rows, "id int, lat double, lon double")


def test_geo_rejects_undersized_cells(spark):
    pts = _points(spark, [(1, 0.0, 0.0)])
    # 1-degree cells are ~111 km at the equator but only ~79 km wide at
    # lat 45 — too narrow for a 100 km radius.
    with pytest.raises(ValueError, match="smaller than radius"):
        geo_cell_pairs(pts, "id", "lat", "lon", radius_km=100.0,
                       cell_deg=1.0, max_abs_lat=45.0)


def test_geo_rejects_polar_bound(spark):
    pts = _points(spark, [(1, 0.0, 0.0)])
    with pytest.raises(ValueError, match="max_abs_lat"):
        geo_cell_pairs(pts, "id", "lat", "lon", radius_km=1.0,
                       cell_deg=10.0, max_abs_lat=90.0)


def test_geo_matches_bruteforce_across_cell_edges(spark):
    # a cluster straddling cell boundaries (cell_deg=2 → edges at even
    # degrees) plus far-away points; includes a pair in diagonal-adjacent
    # cells and a same-point-different-id duplicate (distance 0).
    rows = [
        (1, 1.99, 1.99),   # cell (0,0) corner
        (2, 2.01, 2.01),   # cell (1,1) — diagonal neighbor of 1
        (3, 1.99, 2.01),   # cell (0,1)
        (4, 2.01, 1.99),   # cell (1,0)
        (5, 1.99, 1.99),   # duplicate of 1
        (6, 40.0, 20.0),   # far away
        (7, -3.0, 7.5),    # alone
    ]
    pts = _points(spark, rows)
    got = {
        (r.id_a, r.id_b)
        for r in geo_cell_pairs(pts, "id", "lat", "lon", radius_km=50.0,
                                cell_deg=2.0, max_abs_lat=45.0).collect()
    }

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        rla1, rla2 = math.radians(la1), math.radians(la2)
        dla, dlo = rla2 - rla1, math.radians(lo2 - lo1)
        h = math.sin(dla / 2) ** 2 + math.cos(rla1) * math.cos(rla2) * math.sin(dlo / 2) ** 2
        return 2 * 6371 * math.asin(math.sqrt(h))

    want = {
        (a, b)
        for i, (a, *pa) in enumerate(rows)
        for (b, *pb) in rows[i + 1:]
        if hav(tuple(pa), tuple(pb)) <= 50.0
    }
    assert got == want
    assert (1, 2) in got            # diagonal-cell pair not missed
    assert (1, 5) in got            # zero-distance pair kept once
    assert all(a < b for a, b in got)


def test_geo_dateline_pairs_found(spark):
    # points within radius on opposite sides of the antimeridian: the
    # lon cell ring wraps (pmod), so lon 179.9 and -179.9 share a probe
    # cell — the silent recall hole the round-6 advice flagged.
    rows = [
        (1, 10.0, 179.9),
        (2, 10.0, -179.9),   # ~22 km east of 1, across the seam
        (3, 10.0, 179.0),    # ~120 km from 2 (also crosses the seam)
        (4, -10.0, -179.95),  # wrong hemisphere — far from all
        (5, 10.0, 180.0),    # lon=180 normalizes onto the -180 cell
    ]
    pts = _points(spark, rows)
    got = {
        (r.id_a, r.id_b)
        for r in geo_cell_pairs(pts, "id", "lat", "lon", radius_km=50.0,
                                cell_deg=2.0, max_abs_lat=45.0).collect()
    }
    assert (1, 2) in got    # straddling pair recovered
    assert (2, 5) in got    # lon=180 ≡ -180 (11 km from 2)
    assert (1, 5) in got
    assert (2, 3) not in got  # >radius, even though both near the seam
    assert all(a < b for a, b in got)


def test_geo_rejects_non_divisor_cell_deg(spark):
    pts = _points(spark, [(1, 0.0, 0.0)])
    with pytest.raises(ValueError, match="does not divide 360"):
        geo_cell_pairs(pts, "id", "lat", "lon", radius_km=50.0,
                       cell_deg=7.0, max_abs_lat=45.0)


def test_geo_negative_coordinate_cells(spark):
    # floor() (not int-cast truncation) must be used so points just
    # below 0 land in cell -1, keeping adjacency with points just above.
    pts = _points(spark, [(1, -0.01, -0.01), (2, 0.01, 0.01)])
    got = geo_cell_pairs(pts, "id", "lat", "lon", radius_km=10.0,
                         cell_deg=2.0, max_abs_lat=45.0).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]


# --------------------------------------------------------------------------
# n_hop_reach
# --------------------------------------------------------------------------

def test_reach_minimum_hop_on_diamond(spark):
    # a→b, a→c, b→d, c→d, d→e: d is reachable two ways, both hop 2;
    # a back-edge e→a must NOT relabel a (visited wins, hop stays 0).
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("e", "a")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hop for r in n_hop_reach(edges, seeds, 3).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_reach_respects_hop_cap_and_direction(spark):
    # chain a→b→c→d; cap 2 excludes d; reverse edge d→c never pulls d in.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "c")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hop for r in n_hop_reach(edges, seeds, 2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_reach_multi_seed_takes_min_hop(spark):
    # two seeds; c is 2 hops from a but 1 hop from x — min wins; a seed
    # that is also reachable from another seed keeps hop 0.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "c"), ("x", "a")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",), ("x",)], "node string")
    got = {r.node: r.hop for r in n_hop_reach(edges, seeds, 3).collect()}
    assert got == {"a": 0, "x": 0, "b": 1, "c": 1}


def test_reach_empty_frontier_terminates_early(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.hop for r in n_hop_reach(edges, seeds, 5).collect()}
    assert got == {"a": 0, "b": 1}


# --------------------------------------------------------------------------
# interval_overlap_pairs
# --------------------------------------------------------------------------

def _intervals(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s),
          dt.datetime(2024, 1, 1) + dt.timedelta(minutes=e)) for i, s, e in rows],
        "interval_id long, start_ts timestamp, end_ts timestamp",
    )


def test_overlap_counts_each_pair_once_across_buckets(spark):
    # long interval spanning 5 hour-buckets overlapping a short one in
    # its 4th bucket: the pair shares 4 bucket rows but must emit once.
    iv = _intervals(spark, [(1, 0, 300), (2, 200, 220)])
    got = interval_overlap_pairs(iv, bucket_seconds=3600).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.overlap_start == dt.datetime(2024, 1, 1, 3, 20)
    assert r.overlap_end == dt.datetime(2024, 1, 1, 3, 40)


def test_overlap_half_open_touching_excluded(spark):
    # [0,60) and [60,120): touching endpoints, no overlap under a.start
    # < b.end AND b.start < a.end; [50,70) overlaps both.
    iv = _intervals(spark, [(1, 0, 60), (2, 60, 120), (3, 50, 70)])
    got = {(r.id_a, r.id_b) for r in
           interval_overlap_pairs(iv, bucket_seconds=3600).collect()}
    assert got == {(1, 3), (2, 3)}


def test_overlap_matches_bruteforce_random(spark):
    # deterministic pseudo-random set vs the quadratic definition
    rows = []
    for i in range(60):
        s = (i * 37) % 480
        rows.append((i, s, s + 1 + (i * 13) % 90))
    iv = _intervals(spark, rows)
    got = {(r.id_a, r.id_b) for r in
           interval_overlap_pairs(iv, bucket_seconds=1800).collect()}
    want = {
        (a, b)
        for ai, (a, sa, ea) in enumerate(rows)
        for (b, sb, eb) in rows[ai + 1:]
        if sa < eb and sb < ea
    }
    # rows isn't sorted by id on both sides of the slice, normalize
    want = {(min(a, b), max(a, b)) for a, b in want}
    assert got == want
