"""Properties of the commutative table checksum: partitioning/order
invariance (the point of a commutative combiner) and single-row
mismatch localization (the point of bucketing)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flight_radar_pipeline_spark.plans import battery, battery_lake  # noqa: F401
from flight_radar_pipeline_spark.plans.battery import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark):
    return {
        (r.bucket): (r.n_rows, r.checksum)
        for r in REGISTRY["orders_table_checksum"].build(spark, SF_DIR).collect()
    }


def test_checksum_is_partitioning_invariant(spark):
    base = _rows(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = _rows(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        many = _rows(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == one == many


def test_checksum_localizes_a_single_row_change(spark):
    """Bump one order's price: exactly that key's bucket changes its
    checksum, every other bucket is untouched, and row counts are
    identical everywhere (the replication-repair contract)."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    victim = orders.select(F.min("o_orderkey")).first()[0]

    import flight_radar_pipeline_spark.plans.battery_lake as lake

    def checksum_of(df):
        # rebuild the entry's expression against an arbitrary frame
        row_render = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
            F.col("o_orderpriority"),
        )
        rh = F.conv(F.substring(F.md5(row_render), 1, 15), 16, 10).cast("bigint")
        return {
            r.bucket: (r.n_rows, r.checksum)
            for r in (
                df.select(
                    (F.col("o_orderkey") % lake._CKSUM_BUCKETS).alias("bucket"),
                    rh.alias("rh"),
                )
                .groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    (
                        F.sum(F.col("rh").cast("decimal(38,0)"))
                        % F.lit(4611686018427387904)
                    )
                    .cast("bigint")
                    .alias("checksum"),
                )
                .collect()
            )
        }

    clean = checksum_of(orders)
    tampered = checksum_of(
        orders.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") == victim, F.col("o_totalprice") + 0.01
            ).otherwise(F.col("o_totalprice")),
        )
    )
    victim_bucket = victim % lake._CKSUM_BUCKETS
    diff = {b for b in clean if clean[b] != tampered[b]}
    assert diff == {victim_bucket}
    assert all(clean[b][0] == tampered[b][0] for b in clean)  # counts equal
