"""Property tests for the lakehouse operators (battery_lake + cdc):

- snapshot diff: identity ⇒ empty diff; each change class detected
  exactly; diff is antisymmetric under swap (added ↔ removed).
- bloom semi-join: the bitmap prefilter admits every true match (no
  false negatives) — the invariant the oracle-equality proof rests on.
- group split: the split is a FUNCTION of the group key (no group
  straddles two splits) and covers every row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T
from flight_radar_pipeline_spark.operators.cdc import (
    row_fingerprint,
    snapshot_changes,
)
from flight_radar_pipeline_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _fp():
    return row_fingerprint(
        [F.col("o_orderkey"), F.round(F.col("o_totalprice") * 100).cast("bigint")]
    )


def test_snapshot_diff_identity_is_empty(spark):
    orders = load_table(spark, SF_DIR, "orders")
    assert snapshot_changes(orders, orders, "o_orderkey", _fp()).count() == 0


def test_snapshot_diff_detects_each_class(spark):
    orders = load_table(spark, SF_DIR, "orders").limit(100).cache()
    keys = [r[0] for r in orders.select("o_orderkey").orderBy("o_orderkey").collect()]
    k_rm, k_ch = keys[0], keys[1]
    old = orders
    new = orders.filter(F.col("o_orderkey") != k_rm).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == k_ch, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    diff = {
        r["o_orderkey"]: r["change_type"]
        for r in snapshot_changes(old, new, "o_orderkey", _fp()).collect()
    }
    assert diff == {k_rm: "removed", k_ch: "changed"}

    # swapping the sides flips removed <-> added on the same keys
    swapped = {
        r["o_orderkey"]: r["change_type"]
        for r in snapshot_changes(new, old, "o_orderkey", _fp()).collect()
    }
    assert swapped == {k_rm: "added", k_ch: "changed"}
    orders.unpersist()


def test_bloom_prefilter_has_no_false_negatives(spark):
    """Every order whose customer is in the build side must survive the
    bitmap prefilter — bit membership is implied by key membership."""
    bits = 4096
    cust = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    build_pos = {
        r[0]
        for r in cust.select(T.hash_bucket(F.col("c_custkey"), bits)).collect()
    }
    orders = load_table(spark, SF_DIR, "orders")
    true_matches = orders.join(
        cust.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    probe_pos = {
        r[0]
        for r in true_matches.select(
            T.hash_bucket(F.col("o_custkey"), bits)
        ).distinct().collect()
    }
    assert probe_pos <= build_pos


def test_group_split_is_group_function(spark):
    import __spark_entry__ as entry

    split = entry.queries()["doc_train_eval_split"](spark, SF_DIR)
    per_group = split.groupBy("lang").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_group.filter(F.col("n_splits") > 1).count() == 0
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert split.count() == n_docs
