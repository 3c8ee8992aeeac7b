"""Exact heavy hitters: the two-pass Misra–Gries scheme must return
EXACTLY the terms above threshold, independent of partition layout —
including adversarial skew where the sketch pass alone would be lossy."""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.heavy_hitters import heavy_hitters


def _truth(rows: list[str], k: int) -> dict[str, int]:
    counts: dict[str, int] = {}
    for text in rows:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    n = sum(counts.values())
    return {t: c for t, c in counts.items() if c * (k + 1) > n}


def _check(spark, texts: list[str], k: int, n_parts: int) -> None:
    df = spark.createDataFrame(
        [(t,) for t in texts], "text string"
    ).repartition(n_parts)
    got = {r["term"]: r["n_occ"] for r in heavy_hitters(df, "text", k).collect()}
    assert got == _truth(texts, k)


def test_skewed_stream_exact(spark):
    # one dominant term + a long tail that churns the MG counters
    texts = ["hot hot hot"] * 50 + [f"tail{i} tail{i + 1}" for i in range(300)]
    for n_parts in (1, 7):
        _check(spark, texts, k=10, n_parts=n_parts)


def test_threshold_boundary_is_strict(spark):
    # 4 terms × 25 occurrences each, k=3 → threshold n/(k+1) = 25 exactly;
    # "count > n/(k+1)" is strict, so NOTHING qualifies
    texts = [f"{t} {t} {t} {t} {t}" for t in "abcd" for _ in range(5)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert heavy_hitters(df, "text", k=3).count() == 0


def test_partition_independence(spark):
    texts = [f"w{i % 17} w{i % 5} common" for i in range(200)]
    df1 = spark.createDataFrame([(t,) for t in texts], "text string")
    out = []
    for n_parts in (1, 3, 16):
        rows = heavy_hitters(df1.repartition(n_parts), "text", k=8).collect()
        out.append(sorted(map(tuple, rows)))
    assert out[0] == out[1] == out[2]
