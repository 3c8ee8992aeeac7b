"""Hand-geometry tests for geo_dbscan_clusters: two dense blobs, a
border point, a chain bridge, and noise — the classic DBSCAN fixtures,
plus a brute-force cross-check of the core/noise partition on a random
cloud."""

from __future__ import annotations

import math
import random


from flight_radar_pipeline_spark.operators.spatial import (
    geo_dbscan_clusters,
)

# ~0.009 degrees of latitude ≈ 1 km
_KM_LAT = 1.0 / 111.195


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, lat, lon) for i, (lat, lon) in enumerate(pts)],
        "id long, lat double, lon double",
    )


def _run(spark, pts, eps_km=1.5, min_pts=3):
    df = _df(spark, pts)
    out = geo_dbscan_clusters(
        df, "id", "lat", "lon", eps_km=eps_km, min_pts=min_pts,
        cell_deg=0.1, max_abs_lat=60.0,
    )
    return {r.id: (r.cluster_id, r.role) for r in out.collect()}


def test_two_blobs_and_noise(spark):
    blob_a = [(10.0 + i * _KM_LAT * 0.4, 20.0) for i in range(4)]   # ids 0-3
    blob_b = [(10.5 + i * _KM_LAT * 0.4, 21.0) for i in range(4)]   # ids 4-7
    lone = [(30.0, 30.0)]                                           # id 8
    got = _run(spark, blob_a + blob_b + lone)
    a_labels = {got[i][0] for i in range(4)}
    b_labels = {got[i][0] for i in range(4, 8)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    assert all(got[i][1] == "core" for i in range(8))
    assert got[8] == (None, "noise")
    # deterministic min-id labeling
    assert a_labels == {0} and b_labels == {4}


def test_border_point_attaches_to_min_cluster(spark):
    # 3 tight core points + one point within eps of ONE core only
    core = [(10.0, 20.0), (10.0 + 0.3 * _KM_LAT, 20.0),
            (10.0 + 0.6 * _KM_LAT, 20.0)]
    border = [(10.0 + 2.0 * _KM_LAT, 20.0)]  # 1.4 km from ONE core only
    got = _run(spark, core + border, eps_km=1.5, min_pts=3)
    assert got[3][1] == "border"
    assert got[3][0] == got[0][0] == 0


def test_chain_of_cores_is_one_cluster(spark):
    # chain spaced 1 km apart: every interior point has 3-in-eps
    # (self + both neighbors) → core; endpoints have 2 → border
    chain = [(10.0 + i * _KM_LAT, 20.0) for i in range(6)]
    got = _run(spark, chain, eps_km=1.2, min_pts=3)
    labels = {got[i][0] for i in range(6)}
    assert labels == {1}  # min CORE id (endpoints are border)
    assert got[0][1] == "border" and got[5][1] == "border"
    assert all(got[i][1] == "core" for i in range(1, 5))


def test_core_partition_matches_bruteforce(spark):
    rng = random.Random(7)
    pts = [
        (10.0 + rng.uniform(0, 8) * _KM_LAT, 20.0 + rng.uniform(0, 8) * _KM_LAT)
        for _ in range(40)
    ]
    eps, min_pts = 1.5, 4
    got = _run(spark, pts, eps_km=eps, min_pts=min_pts)

    def hav(p, q):
        la1, lo1, la2, lo2 = map(math.radians, (*p, *q))
        h = (
            math.sin((la2 - la1) / 2) ** 2
            + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
        )
        return 2 * 6371.0 * math.asin(math.sqrt(h))

    for i, p in enumerate(pts):
        n = sum(1 for q in pts if hav(p, q) <= eps)
        if n >= min_pts:
            assert got[i][1] == "core", i
        else:
            assert got[i][1] in ("border", "noise"), i

def test_min_pts_one_makes_every_point_a_core_singleton(spark):
    """Round-7 ADVICE: min_pts <= 1 must label isolated points as core
    singletons (their own cluster), matching scikit-learn — not noise."""
    # id 0 is isolated; ids 1 and 2 are eps-neighbors of each other
    pts = [(10.0, 10.0), (0.0, 0.0), (0.0, 0.005)]
    got = _run(spark, pts, eps_km=1.5, min_pts=1)
    assert got[0] == (0, "core")
    assert got[1] == (1, "core") and got[2] == (1, "core")
