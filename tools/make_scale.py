"""Synthesize a larger scale factor from sf0.1 for scale-up benchmarking.

The driver testdata tops out at sf0.1; this tool unions R shifted
replicas of it so the expensive families can be measured at ~sf1 without
touching /root/testdata (output goes to a scratch dir, gitignored).

Replica construction keeps workload complexity scaling LINEARLY in the
data (what a real 10× corpus does), not quadratically:
- ids (doc_id, vec_id, event_id, user_id, *_key) shift by replica·stride
  so keys stay unique;
- document text gets a per-replica token suffix on every token, so
  near-duplicate structure repeats per replica instead of every replica
  colliding with every other inside the same MinHash/SimHash buckets
  (which would grow candidate pairs ~R² by construction, measuring the
  data, not the engine);
- embeddings circular-shift by the replica index (norm- and
  structure-preserving; cross-replica cosines decorrelate);
- events keep their timestamps (the streaming watermark horizon is
  unchanged; state keys grow 10×, which is the point).

Usage: python tools/make_scale.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.session import get_spark_session
from flight_radar_pipeline_spark.sources.readers import load_table

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark_session(app_name="make-scale", timezone="UTC")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # dimension tables copy through unchanged
    for t in ("region", "nation", "customer", "supplier", "part"):
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    def replicate(name: str, shift_cols: list[str], transform=None):
        base = load_table(spark, SRC, name)
        parts = []
        for r in range(reps):
            df = base
            for c in shift_cols:
                df = df.withColumn(c, F.col(c) + F.lit(r * STRIDE))
            if transform is not None:
                df = transform(df, r)
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {reps}x written")

    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate(
        "lineitem", ["l_orderkey", "l_suppkey", "l_partkey"]
    )
    replicate(
        "events",
        ["event_id", "user_id"],
    )
    replicate(
        "documents",
        ["doc_id"],
        transform=lambda df, r: df.withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"(\S+)", rf"$1x{r}"),
        )
        if r
        else df,
    )
    replicate(
        "embeddings",
        ["vec_id"],
        transform=lambda df, r: df.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), r + 1, 64 - r),
                F.slice(F.col("embedding"), 1, r),
            ),
        )
        if r
        else df,
    )

    write_events_zipf(spark, out, reps)
    spark.stop()
    return 0


def write_events_zipf(spark, out: str, reps: int) -> None:
    """Zipf-keyed events variant: same rows and volume as the replicated
    events table, but user_id redrawn LOG-UNIFORMLY over the replicated
    user universe — rank-1 frequency ∝ 1/ln(N), the Zipf(s≈1) shape real
    user traffic has. The driver testdata is ~uniform, so skewed-key
    behavior (AQE skew-join, operators.skew.salted_join) can only be
    measured against this variant (tools/skew_bench.py --events).
    Deterministic: the rank comes from the md5-derived unit hash of
    event_id, so the table is rerun- and partition-invariant."""
    import math

    n_users = reps * 1500  # distinct user_ids in the replicated events
    ev = load_table(spark, out, "events")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("zipf-"), F.col("event_id"))), 1, 6
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(16**6))
    zipf_uid = F.floor(F.exp(u * F.lit(float(math.log(n_users)))))
    ev.withColumn("user_id", zipf_uid.cast("bigint")).write.mode(
        "overwrite"
    ).parquet(f"{out}/events_zipf.parquet")
    print("events_zipf: written")


if __name__ == "__main__":
    raise SystemExit(main())
