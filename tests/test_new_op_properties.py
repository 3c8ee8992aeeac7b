"""Seeded-random property tests for the round-6 operators, each against
an independent reference implementation (same tier as
``tests/test_properties.py``):

- interval_overlap_pairs: result is INVARIANT to bucket_seconds, and
  matches the quadratic definition.
- geo_cell_pairs: result is invariant to cell_deg across valid sizes.
- cdc_apply: matches a pandas fold over the log.
- adamic_adar_pairs: matches a dict-based reference.
- fellegi_sunter_weights: matches a per-pair Python scorer.
"""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.graph import adamic_adar_pairs
from flight_radar_pipeline_spark.operators.mining import fellegi_sunter_weights
from flight_radar_pipeline_spark.operators.spatial import geo_cell_pairs
from flight_radar_pipeline_spark.operators.temporal import interval_overlap_pairs
from flight_radar_pipeline_spark.pipeline import cdc_apply

SEEDS = [3, 77]


def _rand_intervals(rng, n):
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        s = int(rng.integers(0, 600))
        dur = int(rng.integers(1, 300))
        rows.append((i, t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=s + dur)))
    return rows


@pytest.mark.parametrize("seed", SEEDS)
def test_overlap_bucket_size_invariance(spark, seed):
    rng = np.random.default_rng(seed)
    rows = _rand_intervals(rng, 50)
    iv = spark.createDataFrame(
        rows, "interval_id long, start_ts timestamp, end_ts timestamp"
    )
    want = {
        (a, b)
        for ai, (a, sa, ea) in enumerate(rows)
        for (b, sb, eb) in rows[ai + 1:]
        if sa < eb and sb < ea
    }
    want = {(min(a, b), max(a, b)) for a, b in want}
    for bucket in (60, 900, 7200):
        got = {
            (r.id_a, r.id_b)
            for r in interval_overlap_pairs(iv, bucket_seconds=bucket).collect()
        }
        assert got == want, f"bucket_seconds={bucket}"


@pytest.mark.parametrize("seed", SEEDS)
def test_geo_cell_size_invariance(spark, seed):
    rng = np.random.default_rng(seed)
    pts = [
        (i, float(rng.uniform(-40, 40)), float(rng.uniform(-25, 25)))
        for i in range(80)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    results = []
    for cell in (2.0, 3.0, 5.0):
        got = {
            (r.id_a, r.id_b)
            for r in geo_cell_pairs(
                df, "id", "lat", "lon",
                radius_km=150.0, cell_deg=cell, max_abs_lat=41.0,
            ).collect()
        }
        results.append(got)
    assert results[0] == results[1] == results[2]
    # sanity: brute-force agreement
    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        r1, r2 = math.radians(la1), math.radians(la2)
        h = (math.sin((r2 - r1) / 2) ** 2
             + math.cos(r1) * math.cos(r2)
             * math.sin(math.radians(lo2 - lo1) / 2) ** 2)
        return 2 * 6371 * math.asin(math.sqrt(h))
    want = {
        (a, b)
        for i, (a, *pa) in enumerate(pts)
        for (b, *pb) in pts[i + 1:]
        if hav(tuple(pa), tuple(pb)) <= 150.0
    }
    assert results[0] == want


@pytest.mark.parametrize("seed", SEEDS)
def test_cdc_apply_matches_fold(spark, seed):
    rng = np.random.default_rng(seed)
    n_keys, n_changes = 12, 120
    rows = []
    for seq in range(1, n_changes + 1):
        k = int(rng.integers(0, n_keys))
        op = ["I", "U", "D"][int(rng.integers(0, 3))]
        v = None if op == "D" else f"v{seq}"
        rows.append((k, v, seq, op))
    log = spark.createDataFrame(rows, "k long, v string, seq long, op string")
    got = {r.k: r.v for r in cdc_apply(log, ["k"]).collect()}

    state: dict[int, str | None] = {}
    for k, v, seq, op in rows:  # already seq-ordered
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


@pytest.mark.parametrize("seed", SEEDS)
def test_adamic_adar_matches_reference(spark, seed):
    rng = np.random.default_rng(seed)
    edges = {(f"u{int(rng.integers(0, 15))}", f"i{int(rng.integers(0, 25))}")
             for _ in range(150)}
    m = spark.createDataFrame(sorted(edges), "user string, item string")
    maxdf, min_common = 6, 1
    got = {
        (r.id_a, r.id_b): (r.n_common, r.adamic_adar)
        for r in adamic_adar_pairs(m, maxdf=maxdf, min_common=min_common).collect()
    }

    items: dict[str, set[str]] = {}
    for u, i in edges:
        items.setdefault(i, set()).add(u)
    want: dict[tuple[str, str], tuple[int, float]] = {}
    acc: dict[tuple[str, str], list[int]] = {}
    for i, us in items.items():
        if not (2 <= len(us) <= maxdf):
            continue
        us_sorted = sorted(us)
        for ai, a in enumerate(us_sorted):
            for b in us_sorted[ai + 1:]:
                acc.setdefault((a, b), []).append(len(us))
    for pair, degs in acc.items():
        if len(degs) >= min_common:
            want[pair] = (len(degs), round(sum(1 / math.log(d) for d in degs), 4))
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fs_weights_match_reference(spark, seed):
    rng = np.random.default_rng(seed)
    mu = {"f1": (0.9, 0.2), "f2": (0.75, 0.05)}
    rows = [
        (i, f"b{int(rng.integers(0, 4))}",
         f"x{int(rng.integers(0, 3))}", int(rng.integers(0, 5)))
        for i in range(40)
    ]
    recs = spark.createDataFrame(rows, "id long, blk string, f1 string, f2 long")
    got = {
        (r.id_a, r.id_b): round(r.weight, 6)
        for r in fellegi_sunter_weights(
            recs, "id", ["blk"], mu,
            agree_fns={"f2": lambda a, b: F.abs(a - b) <= 1},
        ).collect()
    }

    def w(agree, m, u):
        return math.log(m / u, 2) if agree else math.log((1 - m) / (1 - u), 2)

    want = {}
    for i, (ida, blka, f1a, f2a) in enumerate(rows):
        for idb, blkb, f1b, f2b in rows[i + 1:]:
            if blka != blkb:
                continue
            a, b = (ida, idb) if ida < idb else (idb, ida)
            want[(a, b)] = round(
                w(f1a == f1b, *mu["f1"]) + w(abs(f2a - f2b) <= 1, *mu["f2"]), 6
            )
    assert got == want


# --------------------------------------------------------------------------
# bounded_min_cost vs brute-force ≤k-hop path enumeration
# --------------------------------------------------------------------------


def _brute_min_cost(edges, seeds, k):
    """Reference: k rounds of full Bellman-Ford relaxation."""
    dist = {s: 0 for s in seeds}
    for _ in range(k):
        nxt = dict(dist)
        for (s, d, w) in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


@pytest.mark.parametrize("seed", SEEDS)
def test_bounded_min_cost_matches_bruteforce(spark, seed):
    from flight_radar_pipeline_spark.operators.graph import bounded_min_cost

    rng = np.random.default_rng(seed)
    n_nodes, n_edges, k = 14, 45, 3
    edges = [
        (f"n{int(rng.integers(0, n_nodes))}",
         f"n{int(rng.integers(0, n_nodes))}",
         int(rng.integers(0, 9)))
        for _ in range(n_edges)
    ]
    seeds = sorted({f"n{int(rng.integers(0, n_nodes))}" for _ in range(3)})
    e = spark.createDataFrame(edges, "src string, dst string, w bigint")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    got = {r["node"]: r["min_cost"] for r in bounded_min_cost(e, s, k).collect()}
    assert got == _brute_min_cost(edges, seeds, k)


def test_mutual_nn_matches_bruteforce(spark):
    from flight_radar_pipeline_spark.operators.similarity import mutual_nn_pairs

    # planes small enough that ~every pair collides in some table, so
    # the LSH candidate set is effectively complete and the brute-force
    # reciprocity reference applies
    rng = np.random.default_rng(11)
    vecs = {i: rng.normal(size=4).tolist() for i in range(12)}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den

    nn = {}
    for i in vecs:
        best = max(
            (j for j in vecs if j != i),
            key=lambda j: (round(cos(vecs[i], vecs[j]), 6), -j),
        )
        nn[i] = best
    expected = {(a, b) for a, b in nn.items() if nn[b] == a and a < b}

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in mutual_nn_pairs(
            df, num_tables=8, planes_per_table=1, n_dims=4
        ).collect()
    }
    # with 8 single-plane tables a pair is missed only if the two vectors
    # differ on ALL 8 hyperplane signs; assert the reciprocal pairs found
    # are a subset of the brute-force truth and at least one was found
    assert got <= expected
    assert got, "no mutual pairs found — candidate generation broken"
