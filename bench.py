"""Benchmark runner: every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query's full plan is forced with the noop sink (distributed execution,
no driver collect) TWICE: the first (cold) timing carries codegen,
Python-worker spin-up (pandas/stateful stages), and stream machinery
startup; the second (warm) timing is the plan's steady-state cost — the
number that attributes round-over-round changes to plan changes instead
of JVM/ordering noise. Reported as one JSON line:
{"metric": ..., "value": warm_total_sec, "unit": "sec",
 "queries": {name: warm_sec}, "queries_cold": {name: cold_sec},
 "cold_total": ..., "timing_mode": "warm-of-2", "sf": ...}

The catalog cache is cleared after each query so per-operator persists
(shingle/gram-set materializations) can't accumulate across the battery
or leak one query's cache into the next one's cold run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from flight_radar_pipeline_spark.session import get_spark_session


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark_session(app_name="frp-spark-bench", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup so the first query's timing is query cost, not
    # session startup
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    queries = entrymod.queries()
    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, fn in queries.items():
        runs: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001 — record, don't abort
                runs.append(-1.0)
                print(
                    f"# bench error {name}: {type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
                break
        cold[name] = runs[0]
        warm[name] = runs[-1]
        spark.catalog.clearCache()

    warm_total = round(sum(v for v in warm.values() if v >= 0), 3)
    cold_total = round(sum(v for v in cold.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "battery_total_wall",
                "value": warm_total,
                "unit": "sec",
                "queries": warm,
                "queries_cold": cold,
                "cold_total": cold_total,
                "timing_mode": "warm-of-2",
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()
    return 0 if all(v >= 0 for v in warm.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
