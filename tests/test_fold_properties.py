"""Property tests for the fold/iteration operators against pure-Python
references: sessionize_capped over random timestamp sequences and
kcore_peel over random graphs — one batched Spark round-trip per
example set, references written independently of the operator code."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.graph import kcore_peel
from flight_radar_pipeline_spark.operators.temporal import sessionize_capped


def _py_sessions(ts: list[int], gap: int, cap: int):
    ns = ngap = ncap = 0
    start = last = None
    for t in sorted(ts):
        if start is None:
            ns += 1
            start = t
        elif t - last > gap:
            ns += 1
            ngap += 1
            start = t
        elif t - start > cap:
            ns += 1
            ncap += 1
            start = t
        last = t
    return ns, ngap, ncap


def test_sessionize_capped_matches_python_reference(spark):
    rng = random.Random(42)
    users = []
    rows = []
    for u in range(30):
        n = rng.randint(1, 40)
        t = 0
        ts = []
        for _ in range(n):
            t += rng.choice([1, 3, 7, 9, 10, 11, 25, 60])
            ts.append(t)
        users.append((u, ts))
        rows += [(u, x) for x in ts]
    df = spark.createDataFrame(rows, "u long, t long").select(
        "u", F.col("t").cast("timestamp").alias("ts")
    )
    got = {
        r.user: (r.n_sessions, r.n_gap_breaks, r.n_cap_breaks)
        for r in sessionize_capped(df, "u", "ts", 10, 25).collect()
    }
    for u, ts in users:
        assert got[u] == _py_sessions(ts, 10, 25), (u, ts)


def _py_kcore(edges: set[tuple[int, int]], k: int, rounds: int):
    """edges = undirected pairs; returns survivor node sets per round."""
    sym = edges | {(b, a) for a, b in edges}
    out = []
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, _b in sym:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
        out.append({a for a, _ in sym})
    return out


def test_kcore_matches_python_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 14
        und = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.25 + 0.1 * trial
        }
        if not und:
            continue
        sym_rows = list(und) + [(b, a) for a, b in und]
        edges = spark.createDataFrame(
            [(str(a), str(b)) for a, b in sym_rows], "src string, dst string"
        )
        k = 3
        got = [
            {int(r.src) for r in df.select("src").distinct().collect()}
            for df in kcore_peel(edges, k=k, rounds=3)
        ]
        want = _py_kcore(und, k, 3)
        assert got == want, (trial, got, want)
