"""Local mirror of the driver's t2 gate: run every battery query on Spark
and its oracle on DuckDB over the same sf dir, compare canonicalized
results exactly.

Usage: python tools/check_battery.py [sf_dir] [comma,separated,query,names]
(the optional second arg restricts the run to those queries)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from flight_radar_pipeline_spark.schemas import TESTDATA_TABLES
from flight_radar_pipeline_spark.session import get_spark_session


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
    if len(out):
        out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark_session(app_name="check-battery", timezone="UTC")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"create view {t} as select * from parquet_scan('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = canonical(fn(spark, sf_dir).toPandas())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(got)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            want = canonical(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error {type(e).__name__}: {e}")
            continue
        status, detail = "OK", ""
        if list(got.columns) != list(want.columns):
            status, detail = "FAIL", f"cols spark={list(got.columns)} duck={list(want.columns)}"
        elif len(got) != len(want):
            status, detail = "FAIL", f"rows spark={len(got)} duck={len(want)}"
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                # Mirror the driver's strict value-hash: a bigint column vs a
                # float64 one (DuckDB HUGEINT sums land as float64 in pandas)
                # must FAIL even though 3 == 3.0 elementwise.
                gk, wk = g.dtype.kind, w.dtype.kind
                if {gk, wk} <= {"i", "u", "f"} and ("f" in (gk, wk)) != (gk == wk == "f"):
                    status, detail = "FAIL", f"col {c} dtype kind spark={g.dtype} duck={w.dtype}"
                    break
                try:
                    eq = (g.isna() & w.isna()) | (g == w)
                except Exception:
                    eq = g.astype(str) == w.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    status, detail = "FAIL", f"col {c} row {i}: spark={g[i]!r} duck={w[i]!r}"
                    break
        if status == "FAIL":
            failures.append(name)
        print(f"{status:5} {name}: {len(got)} rows  ({time.time()-t0:.1f}s) {detail}")
        # drop operator-persisted intermediates (LSH signatures, nn
        # tables) between entries — same shared hook as bench.py
        spark.catalog.clearCache()

    print(f"\n{len(qs) - len(failures)}/{len(qs)} matched")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
