"""Interleaved old-vs-new entry timing in ONE Spark session: alternates
the two checkouts per rep (build + noop run, like the bench), so ambient
machine drift hits both sides equally.

Usage: python tools/ab_time.py <old_repo> <new_repo> <sf_dir> <reps> n1,n2,...
"""

from __future__ import annotations

import importlib
import statistics
import sys
import time


def load_registry(repo: str):
    for mod in list(sys.modules):
        if mod.startswith("flight_radar_pipeline_spark") or mod == "__spark_entry__":
            del sys.modules[mod]
    sys.path.insert(0, repo)
    entry = importlib.import_module("__spark_entry__")
    reg = entry._registry()
    sys.path.remove(repo)
    return reg


def main() -> int:
    old_repo, new_repo, sf_dir, reps_s, names_csv = sys.argv[1:6]
    reps = int(reps_s)
    names = [n for n in names_csv.split(",") if n]

    sys.path.insert(0, new_repo)
    from flight_radar_pipeline_spark.session import get_spark_session

    spark = get_spark_session(app_name="ab-time", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.remove(new_repo)
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        times: dict[str, list[float]] = {"old": [], "new": []}
        # one unmeasured warmup pass per side (codegen/JIT)
        for label, repo in (("old", old_repo), ("new", new_repo)):
            reg = load_registry(repo)
            reg[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        for _ in range(reps):
            for label, repo in (("old", old_repo), ("new", new_repo)):
                reg = load_registry(repo)
                t0 = time.perf_counter()
                df = reg[name].build(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times[label].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        o, n = times["old"], times["new"]
        print(
            f"{name}: old median {statistics.median(o):.3f}s "
            f"{[round(t, 2) for t in o]} | new median "
            f"{statistics.median(n):.3f}s {[round(t, 2) for t in n]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
