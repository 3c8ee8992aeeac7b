"""Measured skew-join comparison: naive shuffle join vs AQE skew
handling vs the manual salted join, on a constructed hot-key dataset
(the driver testdata is uniform, so skew must be synthesized to be
measured).

Dataset: LEFT = n_left fact rows with ``hot_frac`` of them on one key
and the rest uniform over ``n_keys``; RIGHT = ``n_keys`` keys × ``mult``
rows (too many distinct rows to broadcast by policy — broadcast is
disabled to force the shuffle-join regime a big-big join lives in).

Three runs of the same logical aggregate-after-join:
  naive      AQE off            — the hot key lands on one reducer
  aqe_skew   AQE + skewJoin on  — runtime splits the oversized partition
  salted     AQE off, operators.skew.salted_join(buckets=8)

Usage: python tools/skew_bench.py [n_left] [n_keys] [hot_frac] [mult]
   or: python tools/skew_bench.py --events <sf_dir> [mult]
Prints one JSON line.

The ``--events`` mode measures the same three strategies on the
Zipf-keyed events table ``tools/make_scale.py`` writes
(events_zipf.parquet: user_id log-uniform over the user universe — the
rank-frequency shape real user traffic has, rather than one synthetic
hot key): LEFT = the skewed fact, RIGHT = the full user universe × mult
rows (broadcast disabled to force the big-big shuffle-join regime).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.skew import salted_join
from flight_radar_pipeline_spark.session import get_spark_session


def build(spark, n_left: int, n_keys: int, hot_frac: float, mult: int):
    left = spark.range(n_left).select(
        F.when(
            F.col("id") % 1000 < int(hot_frac * 1000), F.lit(0)
        )
        .otherwise(F.xxhash64("id") % n_keys)
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    right = spark.range(n_keys * mult).select(
        (F.col("id") % n_keys).cast("bigint").alias("rk"),
        (F.col("id") % 13).cast("double").alias("w"),
    )
    return left, right


def agg(joined):
    return joined.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )


def run(spark, fn) -> tuple[float, list]:
    t0 = time.perf_counter()
    rows = fn().collect()
    return round(time.perf_counter() - t0, 2), [tuple(r) for r in rows]


def build_events(spark, sf_dir: str, mult: int):
    """LEFT = the Zipf-keyed events fact (make_scale's events_zipf);
    RIGHT = its full distinct-user universe × mult rows."""
    ev = spark.read.parquet(f"{sf_dir}/events_zipf.parquet")
    left = ev.select(
        F.col("user_id").alias("k"), F.col("value").alias("v")
    )
    users = ev.select("user_id").distinct()
    right = users.join(
        spark.range(mult).select(F.col("id").alias("__m"))
    ).select(
        F.col("user_id").alias("rk"),
        (F.col("user_id") % 13 + F.col("__m")).cast("double").alias("w"),
    )
    return left, right


def main() -> int:
    events_mode = len(sys.argv) > 1 and sys.argv[1] == "--events"
    spark = get_spark_session(app_name="skew-bench", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(10).count()

    if events_mode:
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
        mult = int(sys.argv[3]) if len(sys.argv) > 3 else 20
        n_left = n_keys = hot_frac = None
        left, right = build_events(spark, sf_dir, mult)
    else:
        n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
        n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
        hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.6
        mult = int(sys.argv[4]) if len(sys.argv) > 4 else 5
        left, right = build(spark, n_left, n_keys, hot_frac, mult)
    left.cache().count()
    right.cache().count()

    report = {}
    answers = {}

    def naive():
        return agg(left.join(right, left["k"] == right["rk"]))

    def salted():
        return agg(
            salted_join(left, right, on=[("k", "rk")], buckets=8)
        )

    # AQE sizes skew on COMPRESSED shuffle bytes, and this synthetic
    # hot partition (one repeated key, cyclic values) compresses ~10×
    # below the 256 MB default threshold — scale thresholds to the
    # measured partition bytes exactly as a cluster job tunes them to
    # its own shuffle sizes (verified: 16m never engages here, 2m does)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "2m",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
    )
    for label, aqe, skew, fn in (
        ("naive", "false", "false", naive),
        ("aqe_skew", "true", "true", naive),
        ("salted", "false", "false", salted),
    ):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew)
        # run twice, keep warm
        run(spark, fn)
        sec, rows = run(spark, fn)
        report[label] = sec
        answers[label] = rows
    # identical logical result across strategies; double sums compare
    # with rel-tol (partitioning changes float addition order — ulp-level
    # drift over tens of millions of terms, not a correctness difference)
    import math

    def same(a, b):
        return len(a) == len(b) and all(
            (
                math.isclose(x, y, rel_tol=1e-9)
                if isinstance(x, float) or isinstance(y, float)
                else x == y
            )
            for ra, rb in zip(a, b)
            for x, y in zip(ra, rb)
        )

    assert same(answers["naive"], answers["aqe_skew"]) and same(
        answers["naive"], answers["salted"]
    ), "strategies disagree on the join result"
    report["params"] = (
        {"mode": "events_zipf", "mult": mult}
        if events_mode
        else {
            "n_left": n_left, "n_keys": n_keys,
            "hot_frac": hot_frac, "mult": mult,
        }
    )
    print(json.dumps({"skew_bench": report}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
