"""Temporal-join battery: as-of join and pure range join over events.

Operators Spark has no built-in for (operators/temporal.py), each with an
exact DuckDB oracle — DuckDB's native ASOF JOIN and a plain inequality
join state the same semantics independently. Timestamp parity holds
because the synthetic events are microsecond-resolution (Spark's
nanos→micros normalization is lossless) and both sides present formatted
strings / whole-second gaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table


_ASOF_ORACLE = """
    with v as (
        select user_id, ts as vts, event_id as view_id
        from events where event_type = 'view'
    ), c as (
        select event_id as click_id, user_id, ts as cts
        from events where event_type = 'click'
    )
    select c.click_id, c.user_id,
           strftime(c.cts, '%Y-%m-%d %H:%M:%S') as click_ts,
           v.view_id,
           cast(floor(epoch(c.cts)) - floor(epoch(v.vts)) as bigint) as gap_s
    from c asof left join v
      on c.user_id = v.user_id and c.cts >= v.vts
    order by click_id
"""


@register("click_view_attribution", _ASOF_ORACLE)
def click_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the attribution query): every click matched to the
    user's most recent prior view, left-outer, with the gap in whole
    seconds. Distributed as union + one user-keyed shuffle + sorted
    carry-forward — no range cross product. Oracle: DuckDB native
    ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join(clicks, views, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "view_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("view_ts")).alias("gap_s"),
    ).orderBy("click_id")


_RANGE_ORACLE = """
    with iv as (
        select event_id as window_id,
               ts - interval 30 minute as start_ts,
               ts + interval 30 minute as end_ts
        from (select * from events order by value desc, event_id limit 20)
    )
    select window_id, count(*) as n_events
    from iv join events e
      on e.ts >= iv.start_ts and e.ts < iv.end_ts
    group by window_id
    order by window_id
"""


@register("event_window_density", _RANGE_ORACLE)
def event_window_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): how many events fall inside the
    ±30-minute window around each of the 20 highest-value events. The
    bucketed rewrite turns Spark's BroadcastNestedLoopJoin fallback into
    a 30-minute-bucket equi-join. Oracle: plain inequality join."""
    ev = load_table(spark, sf_dir, "events")
    top = (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(20)
        .select(
            F.col("event_id").alias("window_id"),
            (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    pairs = range_join_bucketed(
        ev.select("event_id", "ts"), top, bucket_seconds=1800
    )
    return (
        pairs.groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("window_id")
    )


# --------------------------------------------------------------------------
# multi-touch attribution (time-decay credit over the click path)
# --------------------------------------------------------------------------

_ATTR_LOOKBACK_MIN = 30
_ATTR_HALFLIFE_S = 600.0  # 10-minute credit half-life

_MTA_ORACLE = f"""
    with p as (
        select event_id as purchase_id, user_id, ts as pts
        from events where event_type = 'purchase'
    ), c as (
        select event_id as click_id, user_id, ts as cts
        from events where event_type = 'click'
    ), touch as (
        select p.purchase_id, c.click_id,
               exp(-ln(2) * (floor(epoch(p.pts)) - floor(epoch(c.cts)))
                   / {_ATTR_HALFLIFE_S}) as w
        from p join c
          on c.user_id = p.user_id
         and c.cts <= p.pts
         and c.cts >= p.pts - interval {_ATTR_LOOKBACK_MIN} minute
    )
    select purchase_id, click_id,
           round(w / sum(w) over (partition by purchase_id), 4) as credit
    from touch
    order by purchase_id, click_id
"""


@register("purchase_multitouch_attribution", _MTA_ORACLE)
def purchase_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: every click in the 30 minutes
    before a same-user purchase receives exponentially-decayed weight
    (10-minute half-life), normalized so each purchase distributes
    exactly 1.0 credit over its touch path — the marketing-attribution
    shape (and the general "distribute a label over contributing
    events" pattern). One shuffle: the purchase↔click range join keys on
    user_id with the time band bounding state, exactly like the
    streaming click/view join; normalization is a window sum over
    purchase_id, whose group is the (small) per-purchase touch set. The
    decay uses epoch-second differences so both engines exponentiate
    identical integers."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    import math

    gap_s = F.unix_timestamp("pts") - F.unix_timestamp("cts")
    touch = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cts") <= F.col("pts"))
        & (
            F.col("cts")
            >= F.col("pts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_MIN} MINUTES")
        ),
    ).select(
        "purchase_id",
        "click_id",
        F.exp(F.lit(-math.log(2)) * gap_s / F.lit(_ATTR_HALFLIFE_S)).alias(
            "w"
        ),
    )
    from pyspark.sql import Window

    wp = Window.partitionBy("purchase_id")
    return touch.select(
        "purchase_id",
        "click_id",
        F.round(F.col("w") / F.sum("w").over(wp), 4).alias("credit"),
    ).orderBy("purchase_id", "click_id")
