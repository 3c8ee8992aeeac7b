"""Skew + bucketing physical strategies: salted join parity on skewed
data, and Exchange-free joins between co-bucketed tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.skew import salted_join
from flight_radar_pipeline_spark.sinks import write_bucketed_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50).alias("fk"),
        (F.col("id") * 2).alias("val"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def _key(rows):
    return sorted(map(tuple, rows))


def test_salted_inner_matches_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, fact["fk"] == dim["dk"]).select("fk", "val", "name")
    salted = salted_join(fact, dim, on=[("fk", "dk")], buckets=8).select(
        "fk", "val", "name"
    )
    assert _key(salted.collect()) == _key(plain.collect())


def test_salted_left_keeps_unmatched(skewed):
    fact, dim = skewed
    holey = dim.filter(F.col("dk") != 7)  # drop the hot key's match
    salted = salted_join(fact, holey, on=[("fk", "dk")], how="left", buckets=4)
    plain = fact.join(holey, fact["fk"] == holey["dk"], "left").select(
        "fk", "val", "dk", "name"
    )
    assert _key(salted.collect()) == _key(plain.collect())
    # 900 hot-key rows + ids 907/957 (id % 50 == 7) are unmatched
    assert salted.filter(F.col("name").isNull()).count() == 902


def test_salted_rejects_bad_args(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, on=[("fk", "dk")], how="full")
    with pytest.raises(ValueError, match="collide"):
        salted_join(fact, fact, on=[("fk", "fk")])


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    for t in ("bk_fact", "bk_dim"):
        spark.sql(f"drop table if exists {t}")
        # the ephemeral metastore forgets tables between sessions but the
        # warehouse directory persists — clear it or saveAsTable refuses
        shutil.rmtree(
            f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/{t}",
            ignore_errors=True,
        )
    fact = spark.range(2000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    write_bucketed_table(fact, "bk_fact", "k", num_buckets=8)
    write_bucketed_table(dim, "bk_dim", "k", num_buckets=8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast plan so bucketing is what avoids the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_fact").join(spark.table("bk_dim"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
