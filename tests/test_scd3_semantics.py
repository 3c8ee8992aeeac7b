"""Round-7 ADVICE regression tests for ``pipeline.silver.scd3_apply``:

1. a NON-STRING tracked column must keep its type for brand-new keys
   (the NULL used to be cast to string, coercing the column or failing
   under ANSI);
2. an EXISTING key whose current tracked value is NULL must not be
   mistaken for a new key — its carried previous value survives, and
   NULL→value counts as a change that pushes the (NULL) old value.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flight_radar_pipeline_spark.pipeline.silver import scd3_apply


def test_scd3_non_string_tracked_column_keeps_type(spark):
    current = spark.createDataFrame(
        [(1, 100, 90)],
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),
                T.StructField("amount", T.IntegerType()),
                T.StructField("prev_amount", T.IntegerType()),
            ]
        ),
    )
    updates = spark.createDataFrame(
        [(1, 110), (2, 50)], "k int, amount int"
    )
    out = scd3_apply(current, updates, ["k"], "amount", "prev_amount")
    assert out.schema["prev_amount"].dataType == T.IntegerType()
    rows = {r.k: r for r in out.collect()}
    assert rows[1].amount == 110 and rows[1].prev_amount == 100
    assert rows[2].amount == 50 and rows[2].prev_amount is None


def test_scd3_null_tracked_value_is_not_a_new_key(spark):
    current = spark.createDataFrame(
        [("a", None, "old"), ("b", None, "keep")],
        "k string, status string, prev_status string",
    )
    updates = spark.createDataFrame(
        [("a", "x"), ("b", None), ("c", "y")], "k string, status string"
    )
    out = scd3_apply(current, updates, ["k"], "status", "prev_status")
    rows = {r.k: r for r in out.collect()}
    # NULL -> 'x' is a change: the old (NULL) value pushes into prev
    assert rows["a"].status == "x" and rows["a"].prev_status is None
    # NULL -> NULL is unchanged: the carried prev value survives
    assert rows["b"].status is None and rows["b"].prev_status == "keep"
    # brand-new key starts with NULL prev
    assert rows["c"].status == "y" and rows["c"].prev_status is None


def test_scd3_untouched_rows_pass_through(spark):
    current = spark.createDataFrame(
        [("a", "s1", "s0"), ("z", "zz", None)],
        "k string, status string, prev_status string",
    )
    updates = spark.createDataFrame([("a", "s2")], "k string, status string")
    out = scd3_apply(current, updates, ["k"], "status", "prev_status")
    rows = {r.k: r for r in out.collect()}
    assert rows["a"].prev_status == "s1"
    assert rows["z"].status == "zz" and rows["z"].prev_status is None
    assert out.count() == 2
