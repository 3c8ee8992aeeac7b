"""Measure the naive-global-window vs ranged_cumulative crossover on a
synthesized wide grid — the round-10 adjudication conceded the sandbox's
real tables never reach a cardinality where the one-task
``Window.orderBy`` sort actually hurts (49k distinct values at sf0.1), so
the device's benefit was an argument, not a measurement. This makes it a
measurement: `spark.range(n)` with a scrambled unique order key and a
bigint payload, timed both ways at growing n.

The workload is the device's exact contract: running sum of `v` plus the
global row rank under (key asc) — what the W₁ faces, the rank statistics,
Gini/ABC, and the stump grid all consume. Both shapes are forced end-to-end
by a final aggregate over the produced columns (sum + max of the running
sum and rank), which cannot be pruned past the window.

Usage:  python tools/crossover_bench.py [--sizes 1000000,10000000,50000000]
Prints one JSON line per (n, shape, run) and a final summary table; the
adjudicated numbers live in BASELINE.md §ranged-device crossover.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.session import get_spark_session


def make_grid(spark, n: int):
    """n rows, unique scrambled bigint key, small bigint payload — the
    shape of a distinct-value candidate grid after its groupBy."""
    return spark.range(n).select(
        # bit-reversal of the 63-bit id: a true bijection (unlike a
        # 64-bit hash, which can collide and make the rank assignment
        # nondeterministic), and it destroys arrival order completely
        # (consecutive ids land ~2^62 apart)
        F.conv(F.reverse(F.lpad(F.bin(F.col("id")), 63, "0")), 2, 10)
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 97 + 1).alias("v"),
    )


def naive(df):
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    r = Window.orderBy("k")
    return df.select(
        F.sum("v").over(w).alias("v_cum"),
        F.row_number().over(r).cast("bigint").alias("rnk"),
    )


def device(df):
    out = ranged_cumulative(df, "k", ["v"], with_rank="rnk")
    return out.select("v_cum", "rnk")


def force(df) -> tuple:
    row = df.agg(
        F.sum("v_cum").alias("s"),
        F.max("v_cum").alias("m"),
        F.sum("rnk").alias("sr"),
        F.max("rnk").alias("mr"),
    ).collect()[0]
    return (row.s, row.m, row.sr, row.mr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", default="1000000,10000000,50000000",
        help="comma-separated row counts",
    )
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark_session(
        app_name="crossover-bench", master="local[32]",
        shuffle_partitions=32, timezone="UTC",
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup at a toy size
    for fn in (naive, device):
        force(fn(make_grid(spark, 100_000)))

    summary = []
    for n in sizes:
        checks = {}
        times = {}
        for shape, fn in (("naive_window", naive), ("ranged_device", device)):
            best = float("inf")
            for run in range(args.runs):
                grid = make_grid(spark, n)
                t0 = time.perf_counter()
                res = force(fn(grid))
                dt = time.perf_counter() - t0
                best = min(best, dt)
                print(json.dumps({
                    "n": n, "shape": shape, "run": run,
                    "sec": round(dt, 3),
                }), flush=True)
            checks[shape] = res
            times[shape] = best
        # both shapes must agree exactly — the identity contract
        assert checks["naive_window"] == checks["ranged_device"], (
            n, checks,
        )
        summary.append(
            (n, times["naive_window"], times["ranged_device"],
             times["naive_window"] / times["ranged_device"])
        )

    print("\n| rows | naive Window.orderBy (s) | ranged_cumulative (s) | speedup |")
    print("|---|---|---|---|")
    for n, tn, td, sp in summary:
        print(f"| {n:,} | {tn:.2f} | {td:.2f} | {sp:.2f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
