"""Per-entry phase profiler for the optimization rounds.

For each named registry entry (argv, comma-separated; default = the
slowest entries of the last committed BENCH_DETAIL), runs on the bench's
session/conf and reports, per entry:

- t_build   — wall time of ``spec.build(spark, sf_dir)`` (driver-grid
  entries run their collects / localCheckpoints HERE, so this phase is
  where driver-loop entries spend their wall);
- t_run1/2/3 — wall of three successive noop-sink executions of the
  returned DataFrame (run1 ≈ bench cold, run3 ≈ steady state);
- jobs_build/jobs_run — Spark job COUNT per phase (statusTracker over a
  per-phase job group): sequential-job count is the fixed-cost driver
  at toy SF, so it is the first number to shrink;

and writes ``.explain("formatted")`` to plans/r13/<name>_profile.txt
when ``--plans`` is passed.

Usage:
    python tools/profile_entry.py [--plans] name1,name2,...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from flight_radar_pipeline_spark.session import get_spark_session  # noqa: E402


def _jobs_in_group(spark, group: str) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))


def profile(names: list[str], dump_plans: bool = False) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_session(app_name="frp-profile", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py so cold numbers are comparable
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    reg = entrymod._registry()
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
    )
    if dump_plans:
        os.makedirs(plan_dir, exist_ok=True)

    print(
        f"{'entry':40s} {'build':>7s} {'run1':>7s} {'run2':>7s}"
        f" {'run3':>7s} {'jB':>4s} {'jR':>4s}"
    )
    for name in names:
        spec = reg[name]
        sc = spark.sparkContext
        gb = f"build-{name}"
        sc.setJobGroup(gb, f"build {name}")
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        t_build = time.perf_counter() - t0
        jobs_build = _jobs_in_group(spark, gb)

        runs = []
        jobs_run = 0
        for i in range(3):
            gr = f"run{i}-{name}"
            sc.setJobGroup(gr, f"run{i} {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            if i == 2:
                jobs_run = _jobs_in_group(spark, gr)
        sc.setJobGroup("idle", "idle")
        print(
            f"{name:40s} {t_build:7.3f} {runs[0]:7.3f} {runs[1]:7.3f}"
            f" {runs[2]:7.3f} {jobs_build:4d} {jobs_run:4d}"
        )
        if dump_plans:
            with open(os.path.join(plan_dir, f"{name}_profile.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--plans"]
    dump = "--plans" in sys.argv[1:]
    names = [n for a in args for n in a.split(",") if n]
    profile(names, dump)
