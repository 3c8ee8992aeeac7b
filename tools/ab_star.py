"""Interleaved same-JVM A/B for the round-13 star_contraction window
rewrite, measured through its consumer entry `customer_geo_dbscan`
(build + one noop run per rep, old/new alternating). Also reports the
rounds-to-convergence and asserts result equality old vs new.

Usage: python tools/ab_star.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import flight_radar_pipeline_spark.operators.graph as G  # noqa: E402
from flight_radar_pipeline_spark.session import get_spark_session  # noqa: E402


def old_star_contraction(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 16,
) -> tuple[DataFrame, int]:
    """The pre-round-13 groupBy+join-back formulation, verbatim."""
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(edges: DataFrame) -> tuple:
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _sig(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = adj.groupBy("u").agg(F.min("v").alias("__mn"))
        mins = mins.select("u", F.least("__mn", "u").alias("m"))
        large = (
            adj.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("u"), F.col("v").alias("v"))
            .distinct()
        )
        sm = large.groupBy("v").agg(F.min("u").alias("m"))
        small = (
            large.join(sm, "v")
            .select(F.col("m").alias("a"), F.col("u").alias("b"))
            .union(sm.select(F.col("m").alias("a"), F.col("v").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(small)
        e = small
        if new_sig == sig:
            break
        sig = new_sig
    return e, rounds


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_session(app_name="ab-star", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    import __spark_entry__ as entrymod

    spec = entrymod._registry()["customer_geo_dbscan"]
    new_impl = G.star_contraction

    def run_once() -> tuple[float, list]:
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        rows = sorted(map(tuple, df.collect()))
        spark.catalog.clearCache()
        return dt, rows

    times: dict[str, list[float]] = {"new": [], "old": []}
    results: dict[str, list] = {}
    for rep in range(reps):
        for label, impl in (("new", new_impl), ("old", old_star_contraction)):
            G.star_contraction = impl
            dt, rows = run_once()
            times[label].append(dt)
            results.setdefault(label, rows)
            assert results[label] == rows, f"{label} nondeterministic"
            print(f"rep{rep} {label}: {dt:.3f}s", flush=True)
    G.star_contraction = new_impl
    assert results["new"] == results["old"], "old/new results differ!"
    print("results identical:", len(results["new"]), "rows")
    for label in ("old", "new"):
        print(
            f"{label}: median {statistics.median(times[label]):.3f}s "
            f"all {[round(t, 3) for t in times[label]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
