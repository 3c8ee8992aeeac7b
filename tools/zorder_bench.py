"""Measure the z-order claim: row-group min/max skipping for a 2-D box
predicate, z-ordered layout vs single-column-sorted layout.

`operators/zorder.py` argues the layout prunes on EVERY interleaved
column; this measures it. Both layouts write the sf0.1 events table as
one file with small parquet row groups; the metric is how many row
groups a reader must touch for a box predicate that is narrow in BOTH
user_id and ts — counted directly from the parquet footer statistics
(exactly what Spark's parquet reader consults after predicate pushdown),
plus Spark-side filtered-count wall time for flavor.

Usage: python tools/zorder_bench.py [sf_dir] [out_scratch]
Prints one JSON line + a markdown table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.zorder import zorder_key
from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark.sources.readers import load_table

TS_LO, TS_HI = 1704067200.0, 1706659200.0  # 2024-01-01 .. 2024-01-31 UTC
UID_LO, UID_HI = 0.0, 1500.0
# box: ~5% of the user range x ~5% of the time range
BOX_UID = (700, 774)
BOX_TS = ("2024-01-10 00:00:00", "2024-01-11 12:00:00")
BOX_TS_EPOCH = (1704844800.0, 1704974400.0)
BLOCK_BYTES = 128 * 1024


def _overlapping_row_groups(
    path: str,
    use_uid: bool,
    use_ts: bool,
    box_uid: tuple = BOX_UID,
    box_ts_epoch: tuple = BOX_TS_EPOCH,
) -> tuple[int, int]:
    """(overlapping, total) row groups whose [min,max] statistics
    intersect the enabled predicate dimensions — the footer-statistics
    pruning a parquet reader performs."""
    import pyarrow.parquet as pq

    f = [os.path.join(path, n) for n in os.listdir(path) if n.endswith(".parquet")]
    assert len(f) == 1, f
    meta = pq.ParquetFile(f[0]).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    ui, ti = names.index("user_id"), names.index("ts")
    hit, total = 0, meta.num_row_groups
    for g in range(total):
        ok = True
        if use_uid:
            su = meta.row_group(g).column(ui).statistics
            ok = ok and su.min <= box_uid[1] and su.max >= box_uid[0]
        if use_ts:
            st = meta.row_group(g).column(ti).statistics
            ts_min = (
                st.min.timestamp() if hasattr(st.min, "timestamp") else st.min / 1e6
            )
            ts_max = (
                st.max.timestamp() if hasattr(st.max, "timestamp") else st.max / 1e6
            )
            ok = ok and ts_min <= box_ts_epoch[1] and ts_max >= box_ts_epoch[0]
        if ok:
            hit += 1
    return hit, total


def write_layouts(
    spark,
    sf_dir: str,
    scratch: str,
    block_bytes: int = BLOCK_BYTES,
    uid_domain: tuple = (UID_LO, UID_HI),
) -> dict[str, str]:
    ev = load_table(spark, sf_dir, "events")
    zk = zorder_key(
        [F.col("user_id"), F.unix_timestamp("ts").cast("double")],
        [uid_domain, (TS_LO, TS_HI)],
        bits=8,
    )
    layouts = {
        "ts_sorted": ev.repartition(1).sortWithinPartitions("ts"),
        "zorder": ev.withColumn("__zk", zk)
        .repartition(1)
        .sortWithinPartitions("__zk")
        .drop("__zk"),
    }
    paths = {}
    for name, df in layouts.items():
        p = os.path.join(scratch, name)
        shutil.rmtree(p, ignore_errors=True)
        (
            df.write.mode("overwrite")
            .option("parquet.block.size", str(block_bytes))
            .parquet(p)
        )
        for n in os.listdir(p):  # drop _SUCCESS etc. for the footer scan
            if not n.endswith(".parquet"):
                os.remove(os.path.join(p, n))
        paths[name] = p
    return paths


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else "/tmp/frp-zorder-bench"
    spark = get_spark_session(app_name="zorder-bench", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    # Spark's default INT96 timestamps carry NO row-group statistics —
    # min/max skipping on a time column requires TIMESTAMP_MICROS (the
    # same setting a lakehouse deployment needs for time-based pruning)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

    paths = write_layouts(spark, sf_dir, scratch)
    uid_pred = (F.col("user_id") >= BOX_UID[0]) & (F.col("user_id") <= BOX_UID[1])
    ts_pred = (F.col("ts") >= F.lit(BOX_TS[0]).cast("timestamp")) & (
        F.col("ts") <= F.lit(BOX_TS[1]).cast("timestamp")
    )
    predicates = {
        "user_only": (True, False, uid_pred),
        "time_only": (False, True, ts_pred),
        "2d_box": (True, True, uid_pred & ts_pred),
    }
    report: dict = {}
    for pname, (use_uid, use_ts, pred) in predicates.items():
        report[pname] = {}
        for lname, p in paths.items():
            hit, total = _overlapping_row_groups(p, use_uid, use_ts)
            best = None
            for _ in range(3):
                t = time.time()
                n = spark.read.parquet(p).where(pred).count()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            report[pname][lname] = {
                "row_groups_hit": hit,
                "row_groups_total": total,
                "rows_selected": n,
                "warm_s": round(best, 3),
            }
    print(json.dumps({"box_uid": BOX_UID, "box_ts": BOX_TS, "predicates": report}))
    print()
    print("| predicate | layout | row groups read | of | selected rows |")
    print("|---|---|---|---|---|")
    for pname, layouts in report.items():
        for lname, r in layouts.items():
            print(
                f"| {pname} | {lname} | {r['row_groups_hit']} "
                f"| {r['row_groups_total']} | {r['rows_selected']} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
