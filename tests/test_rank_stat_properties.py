"""Brute-force cross-checks for the rank-test arithmetic: the
distinct-value pre-aggregate formulations of Mann–Whitney U (with ties)
and the conformal k-th-smallest residual must equal direct O(n²)/sorted
computations on random tied data — the rank bookkeeping is exactly
where grouped rewrites go subtly wrong."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F


def _spark_u_stat(spark, rows):
    """The battery's pooled-midrank U computation (battery_r7b shape)."""
    df = spark.createDataFrame(rows, "grp string, value double")
    v = df.groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("grp") == "a", 1).otherwise(0)).alias("cnt1"),
    )
    w = Window.partitionBy().orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = v.select(
        "cnt",
        "cnt1",
        (
            F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("midrank"),
    )
    row = r.agg(
        F.sum("cnt1").alias("n1"),
        F.sum(F.col("midrank") * F.col("cnt1")).alias("r1"),
    ).collect()[0]
    return row.r1 - row.n1 * (row.n1 + 1) / 2.0


def _brute_u(rows):
    """U_a = #(a > b) + 0.5·#(a == b) over all cross pairs."""
    a = [v for g, v in rows if g == "a"]
    b = [v for g, v in rows if g == "b"]
    u = 0.0
    for x in a:
        for y in b:
            u += 1.0 if x > y else (0.5 if x == y else 0.0)
    return u


def test_mann_whitney_u_equals_bruteforce_with_ties(spark):
    rng = random.Random(11)
    for trial in range(4):
        rows = [
            ("a" if rng.random() < 0.4 else "b",
             float(rng.randint(0, 8)))           # heavy ties on purpose
            for _ in range(60 + 20 * trial)
        ]
        got = _spark_u_stat(spark, rows)
        want = _brute_u(rows)
        assert abs(got - want) < 1e-6, (trial, got, want)


def test_conformal_qhat_is_exact_order_statistic(spark):
    """The distinct-residual cumulative-window selection must return the
    k-th smallest value (lower order statistic) under ties."""
    rng = random.Random(3)
    vals = [float(rng.randint(0, 20)) / 4 for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "r double")
    n = len(vals)
    k = (9 * (n + 1) + 9) // 10
    k = min(k, n)
    dist = df.groupBy("r").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy().orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qhat = (
        dist.select("r", F.sum("cnt").over(w).alias("cum"))
        .filter(F.col("cum") >= k)
        .agg(F.min("r"))
        .collect()[0][0]
    )
    assert qhat == sorted(vals)[k - 1]
