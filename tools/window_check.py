"""Driver-gate mirror: run every _WINDOW entry at a given sf dir and
compare against its DuckDB oracle with the driver's canonicalization.

Usage: python tools/window_check.py [sf_dir] [name ...]
"""
from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb

import __spark_entry__ as entry
from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark import schemas
from oracle import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark_session(
        app_name="window-check", master="local[8]", shuffle_partitions=8,
        timezone="UTC",
    )
    con = duckdb.connect()
    for t in schemas.TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from parquet_scan('{p}')")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in entry._WINDOW if not only or n in only]
    bad = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                compare(df, oracles[name], con)
                status = "ok"
            else:
                assert df.count() >= 0
                status = "rows-only"
        except Exception as exc:
            status = f"FAIL: {exc}"
            traceback.print_exc()
            bad.append(name)
        print(f"[{i+1}/{len(names)}] {name}: {status} ({time.time()-t0:.1f}s)",
              flush=True)
    print("FAILED:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
