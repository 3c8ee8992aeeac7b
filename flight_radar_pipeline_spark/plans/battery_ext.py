"""Extended battery: streaming parity, session windows, percentiles,
multimodal plumbing, approximate aggregates.

Registered into the shared REGISTRY on import (see __spark_entry__).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.multimodal import attach_payload, decode_features
from flight_radar_pipeline_spark.operators.skew import salted_join
from flight_radar_pipeline_spark.plans.battery import (
    REGISTRY,
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table
from flight_radar_pipeline_spark.streaming.events import (
    click_view_pairs_stream,
    dedup_keys_stream,
    hourly_counts_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    sessionize_stream_native,
)


@register(
    "click_view_pairs_stream",
    """
    select c.event_id as click_id, v.event_id as view_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') as click_ts
    from events c join events v
      on c.event_type = 'click' and v.event_type = 'view'
     and c.user_id = v.user_id
     and v.ts <= c.ts and v.ts >= c.ts - interval 30 minute
    order by click_id, view_id
    """,
)
def click_view_pairs_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermark-bounded state: all
    (click, view) pairs of a user within a 30-minute lookback. Inner join
    ⇒ the emitted set equals the batch join, which the oracle states
    directly."""
    clicks = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    views = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "view"
    )
    out = click_view_pairs_stream(clicks, views)
    # 8 state partitions for the ~100k-event replay (see
    # run_stream_to_memory): the join keeps 4 state stores per partition
    # and per-batch store overhead dominates at bench scale
    return run_stream_to_memory(
        out, output_mode="append", state_partitions=8
    ).orderBy("click_id", "view_id")


@register(
    "closed_sessions_stream",
    # the stateful operator emits every session except each user's trailing
    # open one — restated here as lag+cumsum sessionization minus the last
    # session per user.
    """
    with d as (
        select user_id, ts,
               lag(ts) over (partition by user_id order by ts) as prev
        from events
    ), m as (
        select user_id, ts,
               case when prev is null or ts - prev > interval 30 minute
                    then 1 else 0 end as new_s
        from d
    ), s as (
        select user_id, ts,
               sum(new_s) over (
                   partition by user_id order by ts
                   rows unbounded preceding
               ) as sid
        from m
    ), agg as (
        select user_id, sid,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') as session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') as session_end,
               count(*) as n_events
        from s group by user_id, sid
    ), last as (
        select user_id, max(sid) as last_sid from agg group by user_id
    )
    select a.user_id, a.session_start, a.session_end, a.n_events
    from agg a join last l
      on a.user_id = l.user_id and a.sid < l.last_sid
    order by a.user_id, a.session_start
    """,
)
def closed_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: ``applyInPandasWithState``
    sessionizer that emits closed sessions and holds each user's open
    session in bounded (3×int64) state. Vectorized numpy inside the
    Arrow-batched group function — no Python row loop."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    closed = sessionize_stream(events, gap_minutes=30)
    return run_stream_to_memory(
        closed, output_mode="append", state_partitions=8
    ).orderBy("user_id", "session_start")


@register(
    "closed_sessions_stream_native",
    # Same lag+cumsum sessionization as closed_sessions_stream, but the
    # emitted set is the native append-mode one: sessions finalized by the
    # GLOBAL final watermark (= max ts over the feed at delay 0), boundary
    # inclusive — not "all but each user's trailing session".
    """
    with d as (
        select user_id, ts,
               lag(ts) over (partition by user_id order by ts) as prev
        from events
    ), m as (
        select user_id, ts,
               case when prev is null or ts - prev > interval 30 minute
                    then 1 else 0 end as new_s
        from d
    ), s as (
        select user_id, ts,
               sum(new_s) over (
                   partition by user_id order by ts
                   rows unbounded preceding
               ) as sid
        from m
    ), agg as (
        select user_id, sid,
               min(ts) as st, max(ts) as en, count(*) as n_events
        from s group by user_id, sid
    )
    select user_id,
           strftime(st, '%Y-%m-%d %H:%M:%S') as session_start,
           strftime(en, '%Y-%m-%d %H:%M:%S') as session_end,
           n_events
    from agg
    where en + interval 30 minute <= (select max(ts) from events)
    order by user_id, session_start
    """,
)
def closed_sessions_stream_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through the BUILT-IN ``session_window`` streaming
    aggregate — the engine-native sibling of ``closed_sessions_stream``'s
    ``applyInPandasWithState`` operator (same gap, same merge boundary,
    different finalization rule: global-watermark closure, stated exactly
    by the oracle's WHERE clause). JVM-only plan, no Python workers."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    closed = sessionize_stream_native(events, gap_minutes=30)
    return run_stream_to_memory(
        closed, output_mode="append", state_partitions=8
    ).orderBy("user_id", "session_start")


@register(
    "hourly_event_counts_stream",
    # identical oracle to the batch `hourly_event_counts` — the whole point:
    # the incremental plan must produce exactly the batch answer.
    """
    select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hour_start,
           event_type,
           count(*) as event_count,
           round(sum(value), 2) as value_sum
    from events
    group by 1, 2
    order by hour_start, event_type
    """,
)
def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming run of the hourly tumbling-window aggregation:
    file source → watermarked window agg → availableNow → memory sink.
    Checked against the same SQL oracle as the batch variant (SURVEY §2.8 —
    the reference has no streaming; this is the north-star surface)."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    result = hourly_counts_stream(events)
    return run_stream_to_memory(result, state_partitions=8).orderBy(
        "hour_start", "event_type"
    )


@register(
    "distinct_user_event_types_stream",
    """
    select distinct user_id, event_type from events
    order by user_id, event_type
    """,
)
def distinct_user_event_types_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (``dropDuplicates`` with per-key state):
    the emitted key set equals batch DISTINCT — the streaming face of the
    exact-dedup family, state one entry per distinct key."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = dedup_keys_stream(events, ["user_id", "event_type"])
    return run_stream_to_memory(
        out, output_mode="append", state_partitions=8
    ).orderBy("user_id", "event_type")


@register(
    "orders_scd2_history",
    # SCD2 apply stated as: closed current rows (semi) ∪ untouched
    # (anti) ∪ fresh update rows; bootstrap history = orders snapshot
    # with valid_from = o_orderdate, open-ended
    """
    with cur as (
        select o_orderkey, o_totalprice,
               o_orderdate as valid_from, null::timestamp as valid_to
        from orders
    ), updates as (
        select o_orderkey, o_totalprice + 1000 as o_totalprice
        from orders where o_orderkey % 10 = 0
    ), closed as (
        select c.o_orderkey, c.o_totalprice, c.valid_from,
               timestamp '2002-01-01 00:00:00' as valid_to
        from cur c where exists (
            select 1 from updates u where u.o_orderkey = c.o_orderkey)
    ), untouched as (
        select c.* from cur c where not exists (
            select 1 from updates u where u.o_orderkey = c.o_orderkey)
    ), fresh as (
        select o_orderkey, o_totalprice,
               timestamp '2002-01-01 00:00:00' as valid_from,
               null::timestamp as valid_to
        from updates
    ), hist as (
        select * from untouched union all
        select * from closed union all
        select * from fresh
    )
    select o_orderkey, round(o_totalprice, 2) as price,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') as valid_from,
           coalesce(strftime(valid_to, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') as valid_to,
           valid_to is null as is_current
    from hist order by o_orderkey, valid_from
    """,
)
def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply (``pipeline.scd2_apply``): a 10% update batch closes
    each updated key's current row at the effective timestamp and appends
    the new current row — full history with non-overlapping validity
    intervals, any past state reconstructable by interval predicate.
    Updated keys gain a second row: output = orders + updates rows."""
    from flight_radar_pipeline_spark.pipeline import scd2_apply

    orders = load_table(spark, sf_dir, "orders")
    history = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", (F.col("o_totalprice") + 1000).alias("o_totalprice")
    )
    effective = F.to_timestamp(F.lit("2002-01-01 00:00:00"))
    out = scd2_apply(history, updates, ["o_orderkey"], effective)
    # open-ended validity presents as a max-sentinel string: keeps the
    # output null-free (pandas compares None != None as a mismatch) and
    # range predicates still work lexicographically
    return out.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("o_orderkey", "valid_from")


@register(
    "incremental_daily_rollup",
    # merged rollup over base ∪ delta ≡ direct rollup over the union —
    # the invariant incremental view maintenance rests on
    """
    with allrows as (
        select o_orderpriority, o_totalprice from orders
        union all
        select o_orderpriority, o_totalprice + 10 from orders
        where o_orderkey % 5 = 0
    )
    select o_orderpriority,
           cast(count(*) as bigint) as n_orders,
           round(sum(o_totalprice), 2) as revenue
    from allrows group by o_orderpriority
    order by o_orderpriority
    """,
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (``pipeline.merge_rollup``): the
    stored per-priority rollup merges with a 20% delta batch's rollup —
    only the delta is aggregated, history is never re-scanned, and the
    result provably equals the from-scratch rollup over base ∪ delta
    (the oracle states that equivalent). Counts ride along as sums;
    averages derive from (sum, count) at read time."""
    from flight_radar_pipeline_spark.pipeline import merge_rollup

    orders = load_table(spark, sf_dir, "orders")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )

    base = rollup(orders)
    delta = rollup(
        orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 10
        )
    )
    merged = merge_rollup(base, delta, ["o_orderpriority"], ["n_orders", "revenue"])
    return merged.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.round("revenue", 2).alias("revenue"),
    ).orderBy("o_orderpriority")


@register(
    "orders_scd1_merge",
    """
    with updates as (
        select o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + 1000 as o_totalprice,
               o_orderdate, o_orderpriority
        from orders where o_orderkey % 10 = 0
    ), merged as (
        select * from updates
        union all
        select * from orders o
        where not exists (select 1 from updates u where u.o_orderkey = o.o_orderkey)
    )
    select o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') as o_orderdate,
           o_orderpriority
    from merged order by o_orderkey
    """,
)
def orders_scd1_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 upsert (pipeline.merge_snapshot): a 10% update batch (price
    +1000, exact in doubles) merged into the orders snapshot, update rows
    winning per key.
    The incremental-reprocess pattern over plain parquet; oracle states
    it as updates ∪ anti-joined current."""
    from flight_radar_pipeline_spark.pipeline import merge_snapshot

    orders = load_table(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    merged = merge_snapshot(orders, updates, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
        "o_orderpriority",
    ).orderBy("o_orderkey")


@register(
    "lineitem_price_stats",
    """
    select l_returnflag,
           round(stddev_samp(l_extendedprice), 2) as price_sd,
           round(var_samp(l_discount), 6) as disc_var,
           round(corr(l_extendedprice, l_quantity), 4) as price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 2) as price_qty_cov
    from lineitem
    group by l_returnflag
    order by l_returnflag
    """,
)
def lineitem_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev/variance, correlation,
    covariance) — single hash aggregate, all algebraic (mergeable partial
    states), so they scale like plain sums. Rounded in-plan: both engines
    use numerically-stable one-pass formulas whose partial-merge order
    differs."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_sd"),
            F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias(
                "price_qty_corr"
            ),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
                "price_qty_cov"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "weekly_cohort_retention",
    """
    with firsts as (
        select user_id, min(date_trunc('week', ts)) as cohort from events group by 1
    ), activity as (
        select distinct user_id, date_trunc('week', ts) as wk from events
    )
    select strftime(cohort, '%Y-%m-%d') as cohort_week,
           cast(floor((epoch(wk) - epoch(cohort)) / 604800) as bigint) as week_offset,
           count(*) as active_users
    from activity join firsts using (user_id)
    group by 1, 2
    order by 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active ISO week,
    counted per week-offset of later activity — two aggregates + one
    broadcastable join on the per-user cohort table."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / 604800
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "event_value_anomalies",
    """
    with stats as (
        select user_id, avg(value) as mu, stddev_samp(value) as sd, count(*) as n
        from events group by 1
    )
    select e.event_id, e.user_id, round((e.value - mu) / sd, 2) as z
    from events e join stats using (user_id)
    where n >= 10 and sd > 0 and abs((e.value - mu) / sd) > 3
    order by e.event_id
    """,
)
def event_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly flagging (|z| > 3): per-key moment
    aggregation broadcast back onto the stream of events — the cheap
    statistical outlier pre-filter. One aggregate + one broadcast join,
    no window over the full table."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "user_id")
        .filter((F.col("n") >= 10) & (F.col("sd") > 0) & (F.abs(z) > 3))
        .select("event_id", "user_id", F.round(z, 2).alias("z"))
        .orderBy("event_id")
    )


@register(
    "hourly_timeline_dense",
    """
    with bounds as (
        select date_trunc('hour', min(ts)) as lo, date_trunc('hour', max(ts)) as hi
        from events
    ), hours as (
        select unnest(generate_series(lo, hi, interval 1 hour)) as hour_start
        from bounds
    ), counts as (
        select date_trunc('hour', ts) as hour_start, count(*) as n
        from events group by 1
    )
    select strftime(h.hour_start, '%Y-%m-%d %H:%M:%S') as hour_start,
           coalesce(n, 0) as n_events
    from hours h left join counts c on h.hour_start = c.hour_start
    order by hour_start
    """,
)
def hourly_timeline_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly timeline (resample): generate the full hour
    spine with ``sequence`` + explode, left-join the observed counts,
    zero-fill misses. The spine generation is O(range) rows from a
    1-row bound aggregate — no driver loop, no collect."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    counts = ev.groupBy(F.date_trunc("hour", "ts").alias("hour_start")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        hours.join(counts, "hour_start", "left")
        .select(
            F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("hour_start")
    )


@register(
    "user_event_type_pivot",
    # pivot = conditional aggregation; stated as CASE sums so the oracle
    # is engine-agnostic
    """
    select user_id,
           cast(sum(case when event_type = 'click'    then 1 else 0 end) as bigint) as click,
           cast(sum(case when event_type = 'error'    then 1 else 0 end) as bigint) as error,
           cast(sum(case when event_type = 'purchase' then 1 else 0 end) as bigint) as purchase,
           cast(sum(case when event_type = 'signup'   then 1 else 0 end) as bigint) as signup,
           cast(sum(case when event_type = 'view'     then 1 else 0 end) as bigint) as view
    from events
    group by user_id
    order by user_id
    """,
)
def user_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (open-ended pivot would need a
    driver-side distinct pass — always pin the columns at scale). One hash
    aggregate; each cell is a conditional count."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
        .orderBy("user_id")
    )
    return out.select(
        "user_id", *[F.col(k).cast("bigint").alias(k) for k in kinds]
    )


@register(
    "customer_7d_order_sum",
    """
    select o_custkey, o_orderkey,
           round(sum(o_totalprice) over (
               partition by o_custkey order by o_orderdate
               range between interval 7 day preceding and current row
           ), 2) as sum_7d
    from orders
    order by o_custkey, o_orderkey
    """,
)
def customer_7d_order_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time: per customer, rolling 7-day
    order-value sum. Spark range frames need a numeric ordering column, so
    the timestamp becomes epoch seconds and the frame is ±seconds — the
    idiomatic translation of an interval frame."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("sum_7d"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "customers_without_orders",
    """
    select c_custkey, c_name from customer c
    where not exists (select 1 from orders o where o.o_custkey = c.c_custkey)
    order by c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (left_anti) — NOT EXISTS as one broadcast hash anti join;
    no subquery re-scan per row."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "nations_with_customers",
    """
    select n_nationkey, n_name from nation n
    where exists (select 1 from customer c where c.c_nationkey = n.n_nationkey)
    order by n_nationkey
    """,
)
def nations_with_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (left_semi) — EXISTS without materializing the right side
    into the output; the probe side short-circuits on first match."""
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    return (
        nation.join(
            customer, nation["n_nationkey"] == customer["c_nationkey"], "left_semi"
        )
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


@register(
    "order_status_cube",
    """
    select coalesce(o_orderstatus, 'ALL') as status,
           coalesce(o_orderpriority, 'ALL') as priority,
           count(*) as n_orders,
           count(distinct o_custkey) as n_customers,
           round(sum(o_totalprice), 2) as revenue
    from orders
    group by cube (o_orderstatus, o_orderpriority)
    order by status, priority
    """,
)
def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with a distinct aggregation — the two
    §2.5 'not present in reference' items in one plan. Spark expands the
    cube into grouping sets with partial aggregation per set; the distinct
    count triggers the expand-then-agg rewrite."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "n_customers",
            "revenue",
        )
        .orderBy("status", "priority")
    )


@register(
    "priority_weighted_price",
    # grouped weighted mean stated directly in SQL
    """
    select o_orderpriority,
           round(sum(o_totalprice * (7 - o_orderkey % 7)) / sum(7 - o_orderkey % 7), 2)
               as weighted_avg_price
    from orders
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def priority_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped weighted mean with built-in aggregates:
    ``sum(price*w)/sum(w)``. Built-ins get map-side partial aggregation,
    which matters decisively here: the group key has 5 distinct values, so
    any no-partial-agg path (e.g. a grouped-agg pandas UDAF, which ships
    every raw row to 5 reducer tasks) funnels the whole fact table through
    5 tasks at scale. With partials, each input partition pre-reduces to
    ≤5 rows before the shuffle. The UDAF surface is demonstrated separately
    on a high-cardinality key (``customer_weighted_price_udaf``)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (7 - F.col("o_orderkey") % 7).cast("double")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice") * w) / F.sum(w), 2
            ).alias("weighted_avg_price")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "customer_weighted_price_udaf",
    # same weighted-mean arithmetic, keyed by customer (high cardinality);
    # the custkey slice bounds the PER-GROUP PYTHON CALL count in the demo,
    # not the operator
    """
    select o_custkey,
           round(sum(o_totalprice * (7 - o_orderkey % 7))
                 / sum(7 - o_orderkey % 7), 2) as weighted_avg_price
    from orders
    where o_custkey % 16 = 0
    group by o_custkey
    order by o_custkey
    limit 100
    """,
)
def customer_weighted_price_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDAF (grouped-agg ``pandas_udf``) — the sanctioned
    Python path when an aggregate genuinely has no built-in: Arrow ships
    whole column batches, numpy reduces them; no per-row Python.

    Caveat this entry exists to document: grouped-agg pandas UDFs do **no
    partial aggregation** — every raw row shuffles to its group's task,
    and each group pays a Python function call. That is only acceptable on
    a high-cardinality key (here ``o_custkey``: reducers stay parallel and
    per-group state stays small). On a low-cardinality key use built-ins
    (see ``priority_weighted_price``). The deterministic ``custkey % 16``
    slice keeps the DEMO's group count (and its per-group call overhead)
    bounded in the bench; the filter is pushed to the scan, the operator
    itself is unrestricted."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(price: pd.Series, weight: pd.Series) -> float:
        return float((price * weight).sum() / weight.sum())

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 16 == 0)
    weighted = orders.select(
        "o_custkey",
        "o_totalprice",
        (7 - F.col("o_orderkey") % 7).cast("double").alias("w"),
    )
    return (
        weighted.groupBy("o_custkey")
        .agg(F.round(weighted_mean("o_totalprice", "w"), 2).alias("weighted_avg_price"))
        .orderBy("o_custkey")
        .limit(100)
    )


@register(
    "segment_revenue_salted_join",
    # the salt is physical strategy only — the oracle is the plain join
    """
    select c_mktsegment,
           count(*) as n_orders,
           round(sum(o_totalprice), 2) as revenue
    from orders join customer on o_custkey = c_custkey
    group by c_mktsegment
    order by c_mktsegment
    """,
)
def segment_revenue_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient equi-join (operators/skew.py): deterministic row-hash
    salt on the fact side, 8× replicated dimension, join on (key, salt) —
    identical logical result to the plain join, verified by the plain-SQL
    oracle. The strategy for a hot customer key when the dimension is too
    big to broadcast and AQE skew handling can't see the skew."""
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = salted_join(orders, customer, on=[("o_custkey", "c_custkey")], buckets=8)
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "user_sessions",
    """
    with e as (
        select user_id, ts,
               case when ts - lag(ts) over (partition by user_id order by ts, event_id)
                         > interval 30 minutes
                    then 1 else 0 end as brk
        from events
    ), s as (
        select user_id, ts,
               cast(sum(brk) over (
                   partition by user_id order by ts
                   rows between unbounded preceding and current row
               ) as bigint) as session_id
        from e
    )
    select user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') as session_start,
           count(*) as n_events
    from s
    group by user_id, session_id
    order by user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via native
    ``session_window`` (same operator streams with state at scale). The
    oracle restates it as lag+cumulative-sum — the classic SQL formulation.
    Boundary semantics (verified empirically on Spark 4.1): two events exactly
    ``gap`` apart MERGE into one session (window merge is
    ``next.start <= prev.end`` inclusive), so the oracle breaks on a strict
    ``>`` — pinned by a constructed exact-gap fixture in
    ``tests/test_session_boundary.py``."""
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("first_ts")
    return (
        sessions.withColumn("session_id", (F.row_number().over(w) - 1).cast("long"))
        .select(
            "user_id",
            "session_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "event_value_percentiles",
    """
    select event_type,
           round(quantile_cont(value, 0.5), 4) as p50,
           round(quantile_cont(value, 0.9), 4) as p90,
           round(quantile_cont(value, 0.99), 4) as p99
    from events
    group by event_type
    order by event_type
    """,
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, verified bit-compatible). At 100 TB swap in
    ``approx_percentile`` with a documented error bound — kept exact here
    because the oracle gate demands it."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "multimodal_features",
    """
    select doc_id,
           octet_length(encode(text)) as byte_len,
           md5(text) as checksum,
           lower(hex(encode(substr(text, 1, 4)))) as head_hex
    from documents
    order by doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: attach opaque payload + metadata, extract
    deterministic features through Arrow-batched ``mapInPandas`` (the real
    media-decode plumbing with the codec stubbed — multimodal/binary.py).
    Oracle restates the byte-level semantics in SQL. (head_hex comparison
    assumes ASCII text, true of the synthetic corpus.)"""
    docs = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    return decode_features(with_payload).orderBy("doc_id")


@register(
    "multimodal_modality_route",
    """
    select doc_id,
           case doc_id % 4 when 0 then 'image/jpeg'
                when 1 then 'image/png'
                when 2 then 'audio/riff'
                else 'text/plain' end as modality,
           (octet_length(encode(text))
            + case when doc_id % 4 = 3 then 0 else 4 end)::bigint as byte_len
    from documents
    order by doc_id
    """,
)
def multimodal_modality_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality routing over binary payloads: real container signatures
    (jpeg/png/RIFF) are prepended deterministically by doc_id, then the
    router byte-sniffs the magic prefix — the ingest step before
    ``partitionBy("modality")`` hands each decoder fleet only its
    container type. The oracle states the expected routing from the
    construction; the Spark side genuinely sniffs (adversarial-prefix
    unit tests in tests/test_multimodal_route.py). Pure column exprs."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        route_modalities,
        with_magic_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    return route_modalities(with_magic_payload(docs)).orderBy("doc_id")


@register(
    "multimodal_image_dims",
    """
    with dims as (
        select doc_id, text,
               doc_id % 2000 + 16 as w, (doc_id * 7) % 2000 + 16 as h
        from documents
    ), blob as (
        -- synthesize the SAME structurally-real headers as the Spark side
        -- (PNG sig + IHDR w/h big-endian; GIF89a + w/h little-endian)
        select doc_id,
               case doc_id % 3
                 when 0 then from_hex('89504e470d0a1a0a0000000d49484452'
                       || lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0')
                       || '0806000000' || hex(encode(text)))
                 when 1 then from_hex('474946383961'
                       || substr(lpad(to_hex(w),4,'0'),3,2) || substr(lpad(to_hex(w),4,'0'),1,2)
                       || substr(lpad(to_hex(h),4,'0'),3,2) || substr(lpad(to_hex(h),4,'0'),1,2)
                       || 'f70000' || hex(encode(text)))
                 else encode(text)
               end as payload
        from dims
    ), hx as (
        -- parse back from the BYTES (not the construction): hex offsets
        -- 2k-1 mirror 1-based byte offsets k
        select doc_id, lower(hex(payload)) as x from blob
    )
    select doc_id,
           case when substr(x,1,16) = '89504e470d0a1a0a' then 'image/png'
                else 'image/gif' end as modality,
           case when substr(x,1,16) = '89504e470d0a1a0a'
                then ('0x' || substr(x,33,8))::int
                else ('0x' || substr(x,15,2) || substr(x,13,2))::int
           end as width,
           case when substr(x,1,16) = '89504e470d0a1a0a'
                then ('0x' || substr(x,41,8))::int
                else ('0x' || substr(x,19,2) || substr(x,17,2))::int
           end as height
    from hx
    where substr(x,1,16) = '89504e470d0a1a0a' or substr(x,1,8) = '47494638'
    order by doc_id
    """,
)
def multimodal_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dimensions parsed NATIVELY from binary payloads — PNG IHDR
    big-endian width/height, GIF logical-screen little-endian — with pure
    column expressions (``substring`` on the binary column + hex→int
    ``conv``): real metadata extraction, no codec, no Python. Both
    engines synthesize byte-identical headers from the corpus and both
    PARSE the bytes back (the oracle works over ``hex(payload)`` string
    offsets), so the gate checks the parse, not the construction. Only
    pixel-data decode remains behind the documented codec stub
    (multimodal/binary.py:decode_image_stub)."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        parse_image_dims,
        with_image_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    dims = parse_image_dims(with_image_payload(docs))
    return dims.where(F.col("modality") != "text/plain").orderBy("doc_id")


@register(
    "approx_distinct_users",
    None,  # approximate by construction — rows-only check, by design
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user counts per event type
    (``approx_count_distinct`` at the engine-default 5% rsd) next to the
    exact count — the sketch path a 100 TB pipeline actually uses. No
    SQL oracle: the HLL estimate is engine-specific; the exact column is
    covered by other queries. rsd sizes the register file at
    (1.04/rsd)²: the earlier 1% setting allocated 2^14 registers per
    (group × partition) partial and measured 5× slower for no useful
    precision at these cardinalities — sketch precision is a knob to
    size against the MEASURED cardinality band, not to max out."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.05).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# KMV distinct-count sketch (deterministic → exact oracle)
# --------------------------------------------------------------------------

_KMV_K = 32

_KMV_ORACLE = f"""
    with du as (
        select distinct event_type, user_id from events
    ), h as (
        select event_type, user_id,
               ((('0x' || substr(md5('kmv-' || user_id::varchar), 1, 6))::bigint
                 + 0.5) / 16777216.0) as hv
        from du
    ), r as (
        select event_type, hv,
               row_number() over (
                   partition by event_type order by hv, user_id
               ) as rn
        from h
    ), x as (
        select event_type, count(*) as n_exact from du group by event_type
    ), kth as (
        select event_type, hv as hk from r where rn = {_KMV_K}
    )
    select x.event_type, x.n_exact,
           case when x.n_exact <= {_KMV_K} then x.n_exact::double
                else round(({_KMV_K} - 1) / k.hk, 3) end as kmv_estimate
    from x left join kth k using (event_type)
    order by event_type
"""


@register("user_kmv_distinct", _KMV_ORACLE)
def user_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per event type, next
    to the exact count: estimate = (k−1)/h_k where h_k is the k-th
    smallest md5-derived unit hash of the distinct users (Bar-Yossef et
    al.'s classic estimator; groups under k users report exactly).
    Because the hash family is deterministic (the engine's auditable
    ``unit_hash``), the sketch has an EXACT SQL oracle — unlike HLL
    (`approx_distinct_users`, rows-only), this estimator is reproducible
    bit-for-bit across engines.

    Completes the sketch family: CMS (point counts), HLL (native
    approx), KMV (mergeable distinct). The k-minimum set is maintained
    as a two-level tournament — per (type, user-hash-bucket) min-k
    arrays, then a per-type merge of ≤256 bounded arrays — NOT a window
    partitioned by the 5-value event_type, which would funnel every
    distinct user through 5 tasks at 100 TB. Level-2 state is bounded
    (256 × k values per group); level-1 subgroups are uniform-hash
    split, so no skew."""
    from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash

    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type", "user_id", unit_hash("user_id", "kmv").alias("hv")
    )
    l1 = h.groupBy("event_type", (F.col("user_id") % 256).alias("__b")).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("hv", "user_id"))),
            1,
            _KMV_K,
        ).alias("__mins")
    )
    l2 = l1.groupBy("event_type").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__mins"))), 1, _KMV_K
        ).alias("__mins")
    )
    # try_element_at is null when the group holds fewer than k users —
    # the exact-report branch of the estimator covers that case
    kth = l2.select(
        "event_type", F.try_element_at("__mins", F.lit(_KMV_K))["hv"].alias("hk")
    )
    exact = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        exact.join(kth, "event_type", "left")
        .select(
            "event_type",
            "n_exact",
            F.when(
                F.col("n_exact") <= _KMV_K, F.col("n_exact").cast("double")
            )
            .otherwise(F.round(F.lit(_KMV_K - 1) / F.col("hk"), 3))
            .alias("kmv_estimate"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# hopping (sliding) event-time windows
# --------------------------------------------------------------------------

_HOP_ORACLE = """
    select strftime(date_trunc('hour', ts) - to_hours(off), '%Y-%m-%d %H:%M:%S')
               as window_start,
           event_type,
           count(*) as event_count
    from events cross join (select unnest([0, 1]) as off)
    group by 1, 2
    order by window_start, event_type
"""


@register("hopping_event_counts", _HOP_ORACLE)
def hopping_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregation: 2-hour windows sliding by 1 hour, so
    every event lands in exactly two windows — the overlapping-window
    face of the event-time family (tumbling: `hourly_event_counts`;
    session: `user_sessions`). Spark's ``window(ts, '2 hours', '1
    hour')`` replicates rows into their windows BEFORE the aggregation
    shuffle (a bounded ×2 map-side multiplier, not a join); the oracle
    states the same replication as a 2-offset cross join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "event_count",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------------
# deep multi-join profit rollup (TPC-H Q9 shape, adapted to these tables)
# --------------------------------------------------------------------------

# revenue accumulates in integer cents: a double sum's partial order
# differs between engines and lands within rounding distance of a
# half-cent boundary at sf0.01
_PROFIT_ORACLE = """
    select n.n_name as nation,
           year(o.o_orderdate)::bigint as o_year,
           round(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          as bigint))::bigint / 100.0, 2) as revenue
    from lineitem l
    join part p on p.p_partkey = l.l_partkey and p.p_name like '%widget%'
    join supplier s on s.s_suppkey = l.l_suppkey
    join nation n on n.n_nationkey = s.s_nationkey
    join orders o on o.o_orderkey = l.l_orderkey
    group by 1, 2
    order by nation, o_year
"""


@register("nation_year_widget_revenue", _PROFIT_ORACLE)
def nation_year_widget_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table profit rollup (the TPC-H Q9 shape on these tables):
    widget-part revenue per supplier nation per order year. The
    join-reordering showcase — part/supplier/nation are broadcast dims,
    the p_name filter pushes into the part scan BEFORE its join prunes
    the fact, and the lineitem⋈orders equi-join is the only big-big
    exchange; Catalyst+AQE pick the order, nothing is hand-scheduled."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                    ).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .orderBy("nation", "o_year")
    )


# --------------------------------------------------------------------------
# explicit GROUPING SETS (the general form under cube/rollup)
# --------------------------------------------------------------------------

_GSETS_ORACLE = """
    select coalesce(o_orderstatus, 'ALL') as status,
           coalesce(strftime(date_trunc('month', o_orderdate), '%Y-%m'), 'ALL')
               as month,
           count(*) as n_orders,
           round(sum(o_totalprice), 2) as revenue
    from orders
    group by grouping sets ((o_orderstatus, date_trunc('month', o_orderdate)),
                            (o_orderstatus), ())
    order by status, month
"""


@register("status_month_grouping_sets", _GSETS_ORACLE)
def status_month_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube and rollup expand
    into, here with a hand-picked set list ((status, month), (status),
    ()) that neither cube nor rollup produces: per-month detail plus a
    per-status subtotal plus a grand total, WITHOUT the month-only slice
    a cube would also pay for. Spark expands the sets with partial
    aggregation per set, exactly one pass over the fact."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gsets_orders")
    return spark.sql(
        """
        select coalesce(o_orderstatus, 'ALL') as status,
               coalesce(date_format(date_trunc('month', o_orderdate),
                                    'yyyy-MM'), 'ALL') as month,
               count(*) as n_orders,
               round(sum(o_totalprice), 2) as revenue
        from __gsets_orders
        group by grouping sets
            ((o_orderstatus, date_trunc('month', o_orderdate)),
             (o_orderstatus), ())
        order by status, month
        """
    )


# --------------------------------------------------------------------------
# event-type transition matrix (Markov chain estimation)
# --------------------------------------------------------------------------

_MARKOV_ORACLE = """
    with seq as (
        select user_id, event_type,
               lag(event_type) over (
                   partition by user_id order by ts, event_id
               ) as prev_type
        from events
    ), pairs as (
        select prev_type, event_type, count(*) as n
        from seq where prev_type is not null
        group by prev_type, event_type
    ), totals as (
        select prev_type, sum(n) as tot from pairs group by prev_type
    )
    select p.prev_type, p.event_type, p.n,
           round(p.n / t.tot, 6) as p
    from pairs p join totals t using (prev_type)
    order by prev_type, event_type
"""


@register("event_type_transitions", _MARKOV_ORACLE)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next type | current type) with observation counts — the
    behavioral-model estimate under funnel analysis and anomalous-
    session detection. One user-keyed window builds the lag pairs
    (sequences live inside user partitions — uniform key, no global
    sort), one hash aggregate counts them, and the per-row normalizer is
    a broadcast of the |types|² pair table. Total order (ts, event_id)
    makes tied timestamps deterministic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
        )
        .orderBy("prev_type", "event_type")
    )


# --------------------------------------------------------------------------
# per-group closed-form OLS (value ~ hour-of-day per event type)
# --------------------------------------------------------------------------

_OLS_ORACLE = """
    with p as (
        select event_type,
               date_part('hour', ts)::double as x,
               value as y
        from events
    )
    select event_type,
           count(*) as n,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 6) as slope,
           round((sum(y) - ((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x))) * sum(x))
                 / count(*), 6) as intercept
    from p
    group by event_type
    order by event_type
"""


@register("event_value_hourly_trend", _OLS_ORACLE)
def event_value_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group model fit as pure aggregation: closed-form OLS of event
    value on hour-of-day, one regression per event type → (type, n,
    slope, intercept). The fit-a-model-per-group shape (feature drift /
    diurnal-trend monitoring) with NO iterative solver: five
    partial-aggregable sums per group and the normal-equation arithmetic
    on top — one shuffle at event_type cardinality, scan-speed at any
    scale. The oracle states the identical sums and formula."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        "event_type",
        F.hour("ts").cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    a = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return a.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# time-series gap interpolation
# --------------------------------------------------------------------------

from flight_radar_pipeline_spark.operators.rounding import (  # noqa: E402
    sql_round_half_up,
)

_INTERP_V = sql_round_half_up("avg(value)", 4)
_INTERP_FILL = sql_round_half_up(
    """case when v is not null then v
            when prev_v is null then next_v
            when next_v is null then prev_v
            else prev_v + (next_v - prev_v)
                 * ((tn - prev_t) / (next_t - prev_t)) end""",
    4,
)

_INTERP_ORACLE = f"""
    with bounds as (
        select date_trunc('hour', min(ts)) as lo, date_trunc('hour', max(ts)) as hi
        from events
    ), hours as (
        select unnest(generate_series(lo, hi, interval 1 hour)) as hour_start
        from bounds
    ), spine as (
        select t.event_type, h.hour_start
        from (select distinct event_type from events) t cross join hours h
    ), obs as (
        select event_type, date_trunc('hour', ts) as hour_start,
               {_INTERP_V} as v
        from events group by 1, 2
    ), j as (
        select s.event_type, s.hour_start, o.v,
               epoch(s.hour_start) as tn
        from spine s left join obs o using (event_type, hour_start)
    ), carry as (
        select event_type, hour_start, v, tn,
            last_value(v ignore nulls) over (
                partition by event_type order by hour_start
                rows between unbounded preceding and current row) as prev_v,
            first_value(v ignore nulls) over (
                partition by event_type order by hour_start
                rows between current row and unbounded following) as next_v,
            last_value(case when v is not null then tn end ignore nulls) over (
                partition by event_type order by hour_start
                rows between unbounded preceding and current row) as prev_t,
            first_value(case when v is not null then tn end ignore nulls) over (
                partition by event_type order by hour_start
                rows between current row and unbounded following) as next_t
        from j
    )
    select event_type,
           strftime(hour_start, '%Y-%m-%d %H:%M:%S') as hour_start,
           {_INTERP_FILL} as v_filled,
           case when v is not null then 'observed'
                when prev_v is null and next_v is null then 'empty'
                when prev_v is null then 'bfill'
                when next_v is null then 'ffill'
                else 'interp' end as fill_kind
    from carry
    order by event_type, hour_start
"""


@register("event_value_interpolated", _INTERP_ORACLE)
def event_value_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly mean value on a dense spine with gaps LINEARLY
    interpolated between the nearest observed anchors (edges carry
    nearest) — the resample→interpolate primitive of sensor/metric
    pipelines, as two ignorenulls carry windows over one shuffle
    (``operators.temporal.interpolate_gaps``)."""
    from flight_radar_pipeline_spark.operators.temporal import interpolate_gaps

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour_start"
        )
    )
    spine = ev.select("event_type").distinct().crossJoin(F.broadcast(hours))
    from flight_radar_pipeline_spark.operators.rounding import (
        expr_round_half_up,
    )

    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(expr_round_half_up(F.avg("value"), 4).alias("v"))
    dense = spine.join(obs, ["event_type", "hour_start"], "left")
    out = interpolate_gaps(dense, "event_type", "hour_start", "v")
    return out.select(
        "event_type",
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "v_filled",
        "fill_kind",
    ).orderBy("event_type", "hour_start")


# --------------------------------------------------------------------------
# winsorization (per-group outlier clipping at exact percentile fences)
# --------------------------------------------------------------------------

_WINSOR_LO, _WINSOR_HI = 0.05, 0.95

_WINSOR_ORACLE = f"""
    with fences as (
        select event_type,
               quantile_cont(value, {_WINSOR_LO}) as p05,
               quantile_cont(value, {_WINSOR_HI}) as p95
        from events group by event_type
    )
    select e.event_type,
           count(*) as n,
           round(any_value(f.p05), 4) as p05,
           round(any_value(f.p95), 4) as p95,
           round(avg(e.value), 4) as mean_raw,
           round(avg(least(greatest(e.value, f.p05), f.p95)), 4)
               as mean_winsorized,
           sum(case when e.value < f.p05 then 1 else 0 end)::bigint as clipped_low,
           sum(case when e.value > f.p95 then 1 else 0 end)::bigint as clipped_high
    from events e join fences f using (event_type)
    group by e.event_type
    order by e.event_type
"""


@register("event_value_winsorized", _WINSOR_ORACLE)
def event_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip each event's value to its type's
    exact [p05, p95] fence and report raw-vs-clipped means — the
    feature-robustification step of an ML feature pipeline. Two passes,
    no sort: an exact-percentile aggregate at event_type cardinality
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``), broadcast back for
    a map-side clip, then one 5-group aggregate. At 100 TB the fence pass
    swaps to ``approx_percentile`` exactly as order_price_deciles_approx
    documents; clipping itself stays a scan-local expression."""
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, {_WINSOR_LO})").alias("p05"),
        F.expr(f"percentile(value, {_WINSOR_HI})").alias("p95"),
    )
    clipped = ev.join(F.broadcast(fences), "event_type").select(
        "event_type",
        "value",
        "p05",
        "p95",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias(
            "__w"
        ),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("p05"), 4).alias("p05"),
            F.round(F.first("p95"), 4).alias("p95"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg("__w"), 4).alias("mean_winsorized"),
            F.sum((F.col("value") < F.col("p05")).cast("bigint")).alias(
                "clipped_low"
            ),
            F.sum((F.col("value") > F.col("p95")).cast("bigint")).alias(
                "clipped_high"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# exponentially weighted moving average over a bounded trailing window
# --------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_K = 20  # trailing window size: bounds per-row state at any scale

_EWMA_ORACLE = f"""
    with o as (
        select user_id, event_id, ts, value,
               row_number() over (
                   partition by user_id order by ts, event_id) as rn
        from events
    )
    select a.user_id, a.event_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') as ts,
           round(a.value, 4) as value,
           round(
               sum(b.value * power(1 - {_EWMA_ALPHA}, a.rn - b.rn))
             / sum(power(1 - {_EWMA_ALPHA}, a.rn - b.rn)), 4) as ewma
    from o a join o b
      on a.user_id = b.user_id
     and b.rn between a.rn - {_EWMA_K - 1} and a.rn
    group by a.user_id, a.event_id, a.ts, a.value
    order by a.user_id, a.event_id
"""


@register("user_value_ewma", _EWMA_ORACLE)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (pandas ``ewm(adjust=True)``
    semantics) over a trailing 20-row window: collect the bounded frame
    with one ordered window, then fold it with ``F.aggregate`` carrying a
    (num, den) accumulator — num = num·(1−α) + v, den = den·(1−α) + 1 —
    entirely JVM-side, no UDF. One shuffle on user_id; per-row state is
    ≤ 20 doubles regardless of history length, which is what makes the
    operator safe at 100 TB (an unbounded-history EWMA needs either a
    sessionized stateful op or this truncation; the (1−α)^20 ≈ 8e-4
    tail weight makes truncation numerically honest). The oracle states
    the same weighted sum relationally via a bounded self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_K - 1), 0)
    )
    acc0 = F.struct(
        F.lit(0.0).alias("num"),
        F.lit(0.0).alias("den"),
    )
    decay = F.lit(1.0 - _EWMA_ALPHA)
    folded = F.aggregate(
        F.col("__frame"),
        acc0,
        lambda acc, v: F.struct(
            (acc["num"] * decay + v).alias("num"),
            (acc["den"] * decay + F.lit(1.0)).alias("den"),
        ),
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.collect_list("value").over(w).alias("__frame"),
        )
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.round("value", 4).alias("value"),
            F.round(folded["num"] / folded["den"], 4).alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )


# --------------------------------------------------------------------------
# stream-stream LEFT OUTER join (conversion attribution with non-converts)
# --------------------------------------------------------------------------

_VIEW_LO_ORACLE = """
    with mx as (
        select least(
            (select max(ts) from events where event_type = 'view'),
            (select max(ts) from events where event_type = 'click')) as m
    ),
    vv as (select * from events where event_type = 'view'),
    cc as (select * from events where event_type = 'click'),
    j as (
        select v.event_id as view_id, c.event_id as click_id,
               v.user_id, v.ts as vts
        from vv v left join cc c
          on c.user_id = v.user_id
         and c.ts >= v.ts and c.ts <= v.ts + interval 30 minute
    )
    select view_id, click_id, user_id,
           strftime(vts, '%Y-%m-%d %H:%M:%S') as view_ts
    from j, mx
    where click_id is not null or vts + interval 30 minute < mx.m
    order by view_id, click_id
"""


@register("view_click_left_outer_stream", _VIEW_LO_ORACLE)
def view_click_left_outer_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: views ⟕ same-user clicks within 30
    minutes AFTER the view — non-converting views emit null-extended once
    the watermark proves no click can still arrive. The effective final
    watermark is the MIN over both sides' event-time maxima (Spark's
    default multipleWatermarkPolicy), which the oracle's LEAST states;
    boundary pinned by ``tests/test_session_boundary.py``."""
    from flight_radar_pipeline_spark.streaming.events import (
        view_click_left_outer_stream,
    )

    views = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "view"
    )
    clicks = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    out = view_click_left_outer_stream(views, clicks)
    return run_stream_to_memory(
        out, output_mode="append", state_partitions=8
    ).orderBy("view_id", "click_id")


# --------------------------------------------------------------------------
# population-stability-index drift between consecutive months
# --------------------------------------------------------------------------

_PSI_ORACLE = """
    with m as (
        select strftime(date_trunc('month', o_orderdate), '%Y-%m') as month,
               o_orderstatus as status, count(*) as c
        from orders group by 1, 2
    ), p as (
        select month, status,
               c / (sum(c) over (partition by month)) as frac
        from m
    ), lagged as (
        select cur.month, cur.status, cur.frac as frac_cur, prev.frac as frac_prev
        from p cur join p prev
          on prev.status = cur.status
         and prev.month = strftime(
                date_trunc('month', strptime(cur.month || '-01', '%Y-%m-%d'))
                - interval 1 month, '%Y-%m')
    )
    select month,
           round(sum((frac_cur - frac_prev) * ln(frac_cur / frac_prev)), 6)
               as psi
    from lagged
    group by month
    order by month
"""


@register("order_status_psi_drift", _PSI_ORACLE)
def order_status_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month population-stability index of the order-status
    mix — the drift monitor an ML platform runs on every categorical
    feature: PSI = Σ (p−q)·ln(p/q) between consecutive months'
    distributions. The fact table aggregates ONCE to month×status counts
    (partial-aggregated, tiny); fractions, the month self-join and the
    PSI fold all happen on that aggregate, so the drift layer costs
    nothing at any corpus size. Statuses present in only one of the two
    months would need Laplace smoothing; this domain is closed (F/O/P),
    so the plain estimator is exact."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        ),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("month")
    p = m.select(
        "month", "status", (F.col("c") / F.sum("c").over(w)).alias("frac")
    )
    prev = p.select(
        F.date_format(
            F.add_months(F.to_date(F.concat("month", F.lit("-01"))), 1),
            "yyyy-MM",
        ).alias("month"),
        F.col("status"),
        F.col("frac").alias("frac_prev"),
    )
    return (
        p.join(prev, ["month", "status"])
        .groupBy("month")
        .agg(
            F.round(
                F.sum(
                    (F.col("frac") - F.col("frac_prev"))
                    * F.log(F.col("frac") / F.col("frac_prev"))
                ),
                6,
            ).alias("psi")
        )
        .orderBy("month")
    )


# --------------------------------------------------------------------------
# event-type co-occurrence lift (market-basket over user-day baskets)
# --------------------------------------------------------------------------

_LIFT_ORACLE = """
    with baskets as (
        select distinct user_id, date_trunc('day', ts) as day, event_type
        from events
    ), nb as (
        select count(distinct (user_id, day)) as n
        from baskets
    ), item as (
        select event_type, count(*) as c from baskets group by event_type
    ), pair as (
        select a.event_type as type_a, b.event_type as type_b,
               count(*) as c_ab
        from baskets a join baskets b
          on a.user_id = b.user_id and a.day = b.day
         and a.event_type < b.event_type
        group by 1, 2
    )
    select p.type_a, p.type_b, p.c_ab,
           round((p.c_ab * nb.n) / (ia.c * ib.c), 4) as lift
    from pair p
    join item ia on ia.event_type = p.type_a
    join item ib on ib.event_type = p.type_b
    cross join nb
    order by type_a, type_b
"""


def _lift_basket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one fact-side subplan of `session_event_type_lift`: one
    shuffle to per-(user, day) sorted type-set baskets, one explode
    emitting every pair (a < b), every item, and a basket marker, one
    bounded groupBy → the ≤(C(k,2)+k+1)-row stats grid (k = |types|)."""
    ev = load_table(spark, sf_dir, "events")
    ba = (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .groupBy("user_id", "day")
        .agg(F.sort_array(F.collect_set("event_type")).alias("ts"))
    )
    rows = F.expr(
        """
        concat(
          flatten(transform(ts, (x, i) ->
            transform(slice(ts, i + 2, size(ts)), y ->
              named_struct('kind', 'pair', 'ta', x, 'tb', y)))),
          transform(ts, x ->
            named_struct('kind', 'item', 'ta', x,
                         'tb', cast(null as string))),
          array(named_struct('kind', 'basket',
                             'ta', cast(null as string),
                             'tb', cast(null as string)))
        )
        """
    )
    return (
        ba.select(F.explode(rows).alias("s"))
        .groupBy("s.kind", "s.ta", "s.tb")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register_grid_plans("session_event_type_lift")
def _lift_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"basket_stats": _lift_basket_stats(spark, sf_dir)}


@register("session_event_type_lift", _LIFT_ORACLE)
def session_event_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types co-occurring in the same
    user-day basket: lift(A,B) = P(A∧B) / (P(A)·P(B)) — the association
    screen behind "users who error also purchase?" dashboards. Baskets
    collapse to sorted distinct type SETS in one shuffle (collect_set
    dedups in the same aggregate), so pair fan-out per basket is bounded
    by the CLOSED type domain (≤ C(5,2) = 10 structs per basket
    regardless of event volume) — the a-priori trick, emitted as array
    combinations instead of a basket self-join. Pair counts, item
    margins, and the basket total all come out of the SAME explode +
    one bounded groupBy, checkpointed at ≤(C(k,2)+k+1) rows so the
    final broadcast assembly reads the grid instead of re-deriving the
    fact subtree under each consumer (the round-6 form referenced the
    basket distinct four times: 14 exchanges → 2 + tiny; one fact scan
    at runtime instead of up to four). Subplan audited via GRID_PLANS."""
    agg = _lift_basket_stats(spark, sf_dir).localCheckpoint(eager=True)
    pair = agg.filter(F.col("kind") == "pair").select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("cnt").alias("c_ab"),
    )
    ia = agg.filter(F.col("kind") == "item").select(
        F.col("ta").alias("type_a"), F.col("cnt").alias("ca")
    )
    ib = agg.filter(F.col("kind") == "item").select(
        F.col("ta").alias("type_b"), F.col("cnt").alias("cb")
    )
    nb = agg.filter(F.col("kind") == "basket").select(
        F.col("cnt").alias("n")
    )
    return (
        pair.join(F.broadcast(ia), "type_a")
        .join(F.broadcast(ib), "type_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            "c_ab",
            F.round(
                (F.col("c_ab") * F.col("n")) / (F.col("ca") * F.col("cb")), 4
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# sliding-window mean-shift changepoint detection
# --------------------------------------------------------------------------

_SHIFT_H = 24 * 3600  # comparison window: 24 hours each side, in seconds
_SHIFT_Z = 0.9        # flag threshold in pooled-std units

_SHIFT_ORACLE = f"""
    with hourly as (
        select event_type, date_trunc('hour', ts) as hour_start,
               avg(value) as v, count(*) as c
        from events group by 1, 2
    ), stats as (
        select event_type, hour_start, v,
               avg(v) over w_before as mu_b,
               stddev_pop(v) over w_before as sd_b,
               count(*) over w_before as n_b,
               avg(v) over w_after as mu_a,
               stddev_pop(v) over w_after as sd_a,
               count(*) over w_after as n_a
        from hourly
        window
            w_before as (partition by event_type order by epoch(hour_start)
                range between {_SHIFT_H} preceding and 1 preceding),
            w_after as (partition by event_type order by epoch(hour_start)
                range between current row and {_SHIFT_H - 1} following)
    )
    select event_type,
           strftime(hour_start, '%Y-%m-%d %H:%M:%S') as hour_start,
           round(mu_a - mu_b, 4) as shift,
           round(abs(mu_a - mu_b)
                 / sqrt((sd_b * sd_b + sd_a * sd_a) / 2 + 1e-9), 4) as zscore
    from stats
    where n_b >= 4 and n_a >= 4
      and abs(mu_a - mu_b)
          / sqrt((sd_b * sd_b + sd_a * sd_a) / 2 + 1e-9) > {_SHIFT_Z}
    order by event_type, hour_start
"""


@register("event_hourly_mean_shift", _SHIFT_ORACLE)
def event_hourly_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window changepoint detector: for every hour, compare the
    mean of the 24 hours BEFORE against the 24 hours AT-AND-AFTER (RANGE
    frames over epoch seconds, so missing hours don't distort the
    window) and flag level shifts above 0.9 pooled standard deviations (tuned to
    the synthetic feed's sparse per-type hourly coverage) —
    the streaming-metrics drift alarm, computed batch. The fact table
    collapses to type×hour means first (partial-aggregated, tiny), and
    BOTH directional windows run over that aggregate in one shuffle at
    event_type cardinality; a 100 TB feed adds nothing to the window
    stage. Both sides guard degenerate windows (≥ 4 populated hours)
    and share the ε-stabilized pooled std."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.avg("value").alias("v"))
    sec = F.unix_timestamp("hour_start")
    wb = (
        Window.partitionBy("event_type")
        .orderBy(sec)
        .rangeBetween(-_SHIFT_H, -1)
    )
    wa = (
        Window.partitionBy("event_type")
        .orderBy(sec)
        .rangeBetween(0, _SHIFT_H - 1)
    )
    stats = hourly.select(
        "event_type",
        "hour_start",
        F.avg("v").over(wb).alias("mu_b"),
        F.stddev_pop("v").over(wb).alias("sd_b"),
        F.count(F.lit(1)).over(wb).alias("n_b"),
        F.avg("v").over(wa).alias("mu_a"),
        F.stddev_pop("v").over(wa).alias("sd_a"),
        F.count(F.lit(1)).over(wa).alias("n_a"),
    )
    pooled = F.sqrt(
        (F.col("sd_b") * F.col("sd_b") + F.col("sd_a") * F.col("sd_a")) / 2
        + 1e-9
    )
    z = F.abs(F.col("mu_a") - F.col("mu_b")) / pooled
    return (
        stats.filter(
            (F.col("n_b") >= 4) & (F.col("n_a") >= 4) & (z > _SHIFT_Z)
        )
        .select(
            "event_type",
            F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            F.round(F.col("mu_a") - F.col("mu_b"), 4).alias("shift"),
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_type", "hour_start")
    )


@register(
    "distinct_user_event_types_within_wm_stream",
    """
    select distinct user_id, event_type from events
    order by user_id, event_type
    """,
)
def distinct_user_event_types_within_wm_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-state streaming dedup via ``dropDuplicatesWithinWatermark``
    — the production sibling of ``distinct_user_event_types_stream``
    (whose per-key state never ages out). The 40-day horizon exceeds the
    replayed feed's 30-day span, so no key can be evicted before
    end-of-stream and the emitted key set equals batch DISTINCT — same
    oracle, different (bounded-state) machinery."""
    from flight_radar_pipeline_spark.streaming.events import (
        dedup_keys_within_watermark_stream,
    )

    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = dedup_keys_within_watermark_stream(
        events, ["user_id", "event_type"]
    )
    return run_stream_to_memory(
        out, output_mode="append", state_partitions=8
    ).orderBy("user_id", "event_type")


# --------------------------------------------------------------------------
# two-sample A/B test per metric (z-test on means)
# --------------------------------------------------------------------------

_AB_ORACLE = """
    with assigned as (
        select event_type, value,
               case when user_id % 2 = 0 then 'A' else 'B' end as arm
        from events
    ), sides as (
        select event_type,
               count(*) filter (arm = 'A') as n_a,
               avg(value) filter (arm = 'A') as mu_a,
               var_samp(value) filter (arm = 'A') as var_a,
               count(*) filter (arm = 'B') as n_b,
               avg(value) filter (arm = 'B') as mu_b,
               var_samp(value) filter (arm = 'B') as var_b
        from assigned group by event_type
    )
    select event_type, n_a, n_b,
           round(mu_a, 4) as mean_a,
           round(mu_b, 4) as mean_b,
           round((mu_b - mu_a)
                 / sqrt(var_a / n_a + var_b / n_b), 4) as zstat,
           case when abs((mu_b - mu_a)
                 / sqrt(var_a / n_a + var_b / n_b)) > 1.96
                then 1 else 0 end as significant_95
    from sides
    order by event_type
"""


@register("ab_test_event_value", _AB_ORACLE)
def ab_test_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample A/B analysis per metric: users hash-split into arms
    (even/odd id — deterministic, the md5-bucket assignment of
    ``doc_deterministic_sample`` at production), then Welch z-statistic
    on the per-arm means of each event type — the experimentation
    readout every growth team runs. ONE scan: per-(type, arm) moments
    via conditional aggregates, the test statistic computed on the
    |types|-row aggregate. Partial-aggregable everywhere; a 100 TB
    event log adds nothing but the scan."""
    ev = load_table(spark, sf_dir, "events")
    arm_a = F.col("user_id") % 2 == 0
    sides = ev.groupBy("event_type").agg(
        F.count(F.when(arm_a, 1)).alias("n_a"),
        F.avg(F.when(arm_a, F.col("value"))).alias("mu_a"),
        F.var_samp(F.when(arm_a, F.col("value"))).alias("var_a"),
        F.count(F.when(~arm_a, 1)).alias("n_b"),
        F.avg(F.when(~arm_a, F.col("value"))).alias("mu_b"),
        F.var_samp(F.when(~arm_a, F.col("value"))).alias("var_b"),
    )
    se = F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
    z = (F.col("mu_b") - F.col("mu_a")) / se
    return sides.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mu_a", 4).alias("mean_a"),
        F.round("mu_b", 4).alias("mean_b"),
        F.round(z, 4).alias("zstat"),
        (F.abs(z) > 1.96).cast("int").alias("significant_95"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# top session paths (3-step event-type sequences)
# --------------------------------------------------------------------------

_PATH_TOP = 15

_PATHS_ORACLE = f"""
    with o as (
        select user_id, event_type, ts, event_id,
               row_number() over (
                   partition by user_id order by ts, event_id) as rn
        from events
    ), tri as (
        select a.event_type || '>' || b.event_type || '>' || c.event_type
                   as path
        from o a
        join o b on b.user_id = a.user_id and b.rn = a.rn + 1
        join o c on c.user_id = a.user_id and c.rn = a.rn + 2
    )
    select path, count(*) as n
    from tri group by path
    order by n desc, path
    limit {_PATH_TOP}
"""


@register("top_session_paths", _PATHS_ORACLE)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step event-type paths across user activity — the
    navigation-mining extension of the bigram Markov matrix
    (``event_type_transitions``) to variable-length sequence windows.
    One shuffle on user_id: both lookahead steps are LEAD windows over
    the same (ts, event_id)-ordered frame (no self-joins — the oracle
    states the identical trigrams relationally via rn joins), then a
    map-side-combined count at path cardinality (≤ |types|³)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(_PATH_TOP)
    )


# --------------------------------------------------------------------------
# time-weighted average (TWAP) per user
# --------------------------------------------------------------------------

_TWAP_ORACLE = """
    with o as (
        select user_id, value,
               floor(epoch(ts)) as t,
               lead(floor(epoch(ts))) over (
                   partition by user_id order by ts, event_id) as t_next
        from events
    )
    select user_id,
           count(*) as n_intervals,
           round(sum(value * (t_next - t)) / sum(t_next - t), 4) as twap,
           round(avg(value), 4) as plain_avg
    from o
    where t_next is not null and t_next > t
    group by user_id
    order by user_id
"""


@register("user_value_twap", _TWAP_ORACLE)
def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each reading is weighted by
    how long it was current (gap to the next event) — the TWAP/sensor
    semantics where a value that held for an hour outweighs ten ticks in
    a second, reported against the naive mean it corrects. One shuffle:
    a single LEAD window keyed on user provides the holding interval,
    then a plain per-user aggregate; zero-length holds and each user's
    open-ended last reading are excluded exactly as the oracle states.
    Epoch arithmetic is floor-to-seconds on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.floor(F.unix_timestamp("ts"))
    o = ev.select(
        "user_id",
        "value",
        t.alias("t"),
        F.lead(t).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t")))
    dur = F.col("t_next") - F.col("t")
    return (
        o.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.round(F.sum(F.col("value") * dur) / F.sum(dur), 4).alias(
                "twap"
            ),
            F.round(F.avg("value"), 4).alias("plain_avg"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# mutual information between two categoricals
# --------------------------------------------------------------------------

_MI_ORACLE = """
    with j as (
        select event_type as x, extract(hour from ts) as y, count(*) as c
        from events group by 1, 2
    ), tot as (select sum(c) as n from j),
    mx as (select x, sum(c) as cx from j group by x),
    my as (select y, sum(c) as cy from j group by y)
    select round(sum((j.c / t.n)
                 * ln((j.c * t.n) / (mx.cx * my.cy))), 6) as mutual_info,
           count(*) as n_cells
    from j
    join mx using (x)
    join my using (y)
    cross join tot t
"""


@register("event_type_hour_mutual_info", _MI_ORACLE)
def event_type_hour_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    dependence screen feature stores run between a categorical feature
    and a categorical target (0 ⇒ independent; here it measures diurnal
    structure). The fact table collapses ONCE to the |types|×24
    contingency table; margins and the MI fold are broadcast-sized
    arithmetic on that aggregate, so the statistic costs one scan at any
    corpus size. The log identity ln(c·n/(cx·cy)) keeps every operand an
    exact integer product before the single division, which is what
    makes the 6dp round match across engines."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.groupBy(
        F.col("event_type").alias("x"), F.hour("ts").alias("y")
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = j.agg(F.sum("c").alias("n"))
    mx = j.groupBy("x").agg(F.sum("c").alias("cx"))
    my = j.groupBy("y").agg(F.sum("c").alias("cy"))
    term = (F.col("c") / F.col("n")) * F.log(
        (F.col("c") * F.col("n")) / (F.col("cx") * F.col("cy"))
    )
    return (
        j.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(term), 6).alias("mutual_info"),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )


@register(
    "top_users_stream",
    """
    select user_id,
           count(*) as n_events,
           round(sum(value), 2) as value_sum
    from events
    group by user_id
    order by value_sum desc, user_id
    limit 5
    """,
)
def top_users_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: per-user running totals maintained by the
    state store, re-ranked every commit in COMPLETE output mode — the
    live top-k dashboard feed. Complete mode re-emits the whole (small)
    aggregate each microbatch, so the final table equals the batch
    ranking exactly regardless of how the feed was split — which is what
    the oracle states. The ranking happens on the |users|-row aggregate,
    never on the raw stream; totals round AFTER aggregation. Total
    order: (value_sum desc, user_id)."""
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    agg = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )
    out = run_stream_to_memory(agg, output_mode="complete", state_partitions=8)
    return out.orderBy(F.desc("value_sum"), F.asc("user_id")).limit(5)


# --------------------------------------------------------------------------
# semi-structured props through the VARIANT type (Spark 4)
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
    select event_type,
           count(*) as n,
           sum(case when json_extract(props, '$.k') is not null
                    then 1 else 0 end)::bigint as with_k,
           round(avg(cast(json_extract_string(props, '$.k') as double)), 4)
               as avg_k,
           max(cast(json_extract_string(props, '$.k') as bigint)) as max_k
    from events
    group by event_type
    order by event_type
"""


@register("event_props_variant", _VARIANT_ORACLE)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the engine-native VARIANT type
    (Spark 4 ``parse_json`` → binary variant encoding) instead of
    per-access string re-parsing: parse ONCE in the scan projection,
    then every field access (``variant_get``) is a typed probe into the
    encoded value — the modern lakehouse answer to JSON-string columns,
    and the 100 TB difference between one parse per row and one parse
    per extraction. Sibling of ``event_props_json`` (get_json_object on
    strings) with the same aggregate so the two paths are directly
    comparable; the oracle states the computation over DuckDB's JSON
    functions."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("__v")
    )
    k = F.try_variant_get("__v", "$.k", "bigint")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k.isNotNull().cast("bigint")).alias("with_k"),
            F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# fulfillment-latency SLA report (percentiles on a big-big join)
# --------------------------------------------------------------------------

_SLA_DAYS = 60

_SLA_ORACLE = f"""
    with lat as (
        select o.o_orderpriority as priority,
               date_diff('day', o.o_orderdate, l.l_shipdate) as days
        from orders o join lineitem l on l.l_orderkey = o.o_orderkey
    )
    select priority,
           count(*) as n_lines,
           round(quantile_cont(days, 0.5), 2) as p50_days,
           round(quantile_cont(days, 0.9), 2) as p90_days,
           round(quantile_cont(days, 0.99), 2) as p99_days,
           round(sum(case when days <= {_SLA_DAYS} then 1 else 0 end)
                 / count(*), 4) as within_sla
    from lat
    group by priority
    order by priority
"""


@register("shipping_latency_sla", _SLA_ORACLE)
def shipping_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency SLA report per priority class: exact
    p50/p90/p99 of line-level fulfillment days plus the fraction inside
    a 60-day SLA — the ops dashboard behind every fulfillment review.
    The latency source is the big-big orders ⋈ lineitem equi-join
    (co-partitioned on the order key — at 100 TB this is the bucketed
    or storage-partitioned join, never a broadcast), and the percentile
    layer aggregates at priority cardinality. Spark ``percentile`` ≡
    DuckDB ``quantile_cont``; the 100 TB swap is ``approx_percentile``,
    exactly as ``order_price_deciles_approx`` demonstrates."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lat = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").alias("days"),
    )
    return (
        lat.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.expr("percentile(days, 0.5)"), 2).alias("p50_days"),
            F.round(F.expr("percentile(days, 0.9)"), 2).alias("p90_days"),
            F.round(F.expr("percentile(days, 0.99)"), 2).alias("p99_days"),
            F.round(
                F.sum((F.col("days") <= _SLA_DAYS).cast("bigint"))
                / F.count(F.lit(1)),
                4,
            ).alias("within_sla"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# WAV audio metadata parsed natively from bytes
# --------------------------------------------------------------------------


def _le_hex_sql(expr: str, nbytes: int) -> str:
    """Little-endian hex of an integer SQL expression, n bytes wide."""
    h = f"lpad(to_hex({expr}), {2 * nbytes}, '0')"
    return " || ".join(
        f"substr({h}, {2 * nbytes - 2 * i - 1}, 2)" for i in range(nbytes)
    )


def _le_parse_sql(hexpos: int, nbytes: int) -> str:
    """Parse an LE integer from hex(payload) at 1-based hex position."""
    parts = " || ".join(
        f"substr(h, {hexpos + 2 * (nbytes - 1 - i)}, 2)" for i in range(nbytes)
    )
    return f"('0x' || {parts})::bigint"


_WAV_ORACLE = f"""
    with d as (
        select doc_id, text,
               (doc_id % 2 + 1)::bigint as ch,
               (case doc_id % 3 when 0 then 8000 when 1 then 16000
                     else 44100 end)::bigint as rate,
               (octet_length(encode(text)) * 64)::bigint as ds
        from documents
    ), blob as (
        -- synthesize the SAME structurally-real PCM-WAV headers as the
        -- Spark side (RIFF size, WAVEfmt, channels/rate/byterate/block/
        -- bits, data size — all little-endian at canonical offsets)
        select doc_id,
               case when doc_id % 2 = 0 then from_hex(
                   '52494646' || {_le_hex_sql("ds + 36", 4)}
                   || '57415645666d742010000000' || '0100'
                   || {_le_hex_sql("ch", 2)} || {_le_hex_sql("rate", 4)}
                   || {_le_hex_sql("rate * ch * 2", 4)}
                   || {_le_hex_sql("ch * 2", 2)} || '1000'
                   || '64617461' || {_le_hex_sql("ds", 4)}
                   || hex(encode(text)))
               else encode(text) end as payload
        from d
    ), parsed as (
        -- parse BACK from the bytes alone (hex-string offsets)
        select doc_id, hex(payload) as h,
               substr(hex(payload), 1, 8) = '52494646' as is_wav
        from blob
    )
    select doc_id,
           'audio/wav' as modality,
           {_le_parse_sql(45, 2)} as channels,
           {_le_parse_sql(49, 4)} as sample_rate,
           {_le_parse_sql(69, 2)} as bits,
           round({_le_parse_sql(81, 4)}
                 / ({_le_parse_sql(49, 4)} * {_le_parse_sql(45, 2)}
                    * ({_le_parse_sql(69, 2)} / 8.0)), 6) as duration_s
    from parsed where is_wav
    order by doc_id
"""


@register("multimodal_audio_meta", _WAV_ORACLE)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM-WAV stream parameters parsed NATIVELY from binary payloads —
    channels, sample rate, bits-per-sample, and the duration implied by
    the data-chunk size, all little-endian ``substring``+``conv`` on the
    first 44 bytes: the audio face of ``multimodal_image_dims``. Both
    engines synthesize byte-identical RIFF headers from the corpus and
    both PARSE the bytes back, so the gate checks the parse. With dims
    and durations native, only sample/pixel decode remains behind the
    documented codec stub."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        parse_wav_meta,
        with_audio_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    meta = parse_wav_meta(with_audio_payload(docs))
    return meta.where(F.col("modality") != "text/plain").orderBy("doc_id")


# --------------------------------------------------------------------------
# MP4 movie-header metadata parsed natively from bytes
# --------------------------------------------------------------------------


def _be_parse_sql(hexpos: int, nbytes: int) -> str:
    """Parse a BE integer from hex(payload) at 1-based hex position."""
    return f"('0x' || substr(h, {hexpos}, {2 * nbytes}))::bigint"


_MP4_ORACLE = f"""
    with d as (
        select doc_id, text,
               (case doc_id % 3 when 0 then 600 when 1 then 1000
                     else 90000 end)::bigint as ts,
               (octet_length(encode(text)) * 50)::bigint as ticks
        from documents
    ), blob as (
        -- the SAME minimal fixed-layout MP4 as the Spark side: valid
        -- ftyp box, moov whose first child is a v0 mvhd (timescale at
        -- byte 49, duration ticks at 53, both big-endian u32)
        select doc_id,
               case when doc_id % 2 = 0 then from_hex(
                   '000000146674797069736f6d0000000069736f6d'
                   || '000000746d6f6f76'
                   || '0000006c6d76686400000000' || repeat('00', 8)
                   || lpad(to_hex(ts), 8, '0') || lpad(to_hex(ticks), 8, '0')
                   || '00010000' || '0100' || repeat('00', 74)
                   || hex(encode(text)))
               else encode(text) end as payload
        from d
    ), parsed as (
        select doc_id, hex(payload) as h,
               substr(hex(payload), 9, 8) = '66747970' as is_mp4
        from blob
    )
    select doc_id,
           'video/mp4' as modality,
           {_be_parse_sql(97, 4)} as timescale,
           {_be_parse_sql(105, 4)} as duration_ticks,
           round({_be_parse_sql(105, 4)} / {_be_parse_sql(97, 4)}::double, 6)
               as duration_s
    from parsed where is_mp4
    order by doc_id
"""


@register("multimodal_video_meta", _MP4_ORACLE)
def multimodal_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 movie-header fields parsed NATIVELY from binary payloads —
    mvhd timescale and duration ticks (big-endian u32 at the fixed
    offsets of the minimal ftyp+moov layout), duration in seconds as
    their ratio — completing the image/audio/video native-metadata
    triad. MP4 is sniffed on the 'ftyp' box TAG at byte 5, the
    container's real signature position (the first 4 bytes are a box
    size, not magic). Both engines synthesize byte-identical blobs and
    both parse them back; general box-walking stays behind the
    documented codec stub."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        parse_mp4_meta,
        with_video_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    meta = parse_mp4_meta(with_video_payload(docs))
    return meta.where(F.col("modality") != "text/plain").orderBy("doc_id")


# --------------------------------------------------------------------------
# JPEG SOF dimensions: bounded marker-segment walk, natively on bytes
# --------------------------------------------------------------------------


def _jpeg_walk_sql(steps: int = 6) -> str:
    """Unrolled marker-segment walk over hex(payload) — the SQL mirror
    of ``parse_jpeg_dims``'s aggregate fold: each step requires the FF
    prefix, latches the SOF0/SOF2 offset, else advances by 2 + the
    segment's big-endian length. 1-based byte k ↔ hex offset 2k−1."""
    # MATERIALIZED: without it DuckDB inlines each step's pos/sof case
    # expressions into the next (they are referenced ~5× per step), and
    # the expression tree grows ~5^steps — measured 54 s at sf0.01 vs
    # 0.05 s materialized
    parts = ["w0 as materialized (select doc_id, h, is_jpeg, 3::bigint as pos, null::bigint as sof from parsed)"]
    for i in range(steps):
        parts.append(f"""w{i + 1} as materialized (
        select doc_id, h, is_jpeg,
               case when sof is not null then pos
                    when substr(h, 2 * pos - 1, 2) <> 'FF' then pos
                    when substr(h, 2 * pos + 1, 2) in ('C0', 'C2') then pos
                    else pos + 2 + ('0x' || substr(h, 2 * pos + 3, 4))::bigint
               end as pos,
               coalesce(sof,
                        case when substr(h, 2 * pos - 1, 2) = 'FF'
                              and substr(h, 2 * pos + 1, 2) in ('C0', 'C2')
                             then pos end) as sof
        from w{i}
    )""")
    return ", ".join(parts), f"w{steps}"


_JPEG_WALK_CTES, _JPEG_WALK_FIN = _jpeg_walk_sql(6)

_JPEG_ORACLE = f"""
    with d as (
        select doc_id, text,
               (doc_id % 4000 + 8)::bigint as w,
               ((doc_id * 11) % 4000 + 8)::bigint as h2,
               (doc_id % 32)::bigint as pad
        from documents
    ), blob as (
        -- synthesize the SAME structurally-real marker streams as the
        -- Spark side: baseline JFIF (APP0+DQT+SOF0) or progressive
        -- Exif-style (variable-length APP1 + SOF2)
        select doc_id,
               case doc_id % 3
                 when 0 then from_hex('FFD8'
                       || 'FFE000104A46494600010100004800480000'
                       || 'FFDB004300' || repeat('00', 64)
                       || 'FFC0001108' || lpad(to_hex(h2), 4, '0')
                       || lpad(to_hex(w), 4, '0') || '03011100021101031101'
                       || hex(encode(text)))
                 when 1 then from_hex('FFD8'
                       || 'FFE1' || lpad(to_hex(pad + 8), 4, '0')
                       || '457869660000' || repeat('00', pad::int)
                       || 'FFC2001108' || lpad(to_hex(h2), 4, '0')
                       || lpad(to_hex(w), 4, '0') || '03011100021101031101'
                       || hex(encode(text)))
                 else encode(text)
               end as payload
        from d
    ), parsed as (
        -- parse BACK from the bytes alone: sniff, then walk segments
        select doc_id, hex(payload) as h,
               substr(hex(payload), 1, 6) = 'FFD8FF' as is_jpeg
        from blob
    ), {_JPEG_WALK_CTES}
    select doc_id,
           'image/jpeg' as modality,
           'FF' || substr(h, 2 * sof + 1, 2) as sof_marker,
           ('0x' || substr(h, 2 * sof + 13, 4))::int as width,
           ('0x' || substr(h, 2 * sof + 9, 4))::int as height
    from {_JPEG_WALK_FIN}
    where is_jpeg and sof is not null
    order by doc_id
"""


@register("multimodal_jpeg_dims", _JPEG_ORACLE)
def multimodal_jpeg_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG frame dimensions parsed NATIVELY from binary payloads with a
    bounded marker-segment WALK (``aggregate`` fold threading the byte
    offset: FF-prefix check, SOF0/SOF2 latch, else advance by the
    segment's big-endian length) — unlike PNG/GIF/WAV the SOF offset is
    not fixed, and the synthesis varies an Exif APP1's length with the
    id so a fixed-offset slice cannot pass. Both engines synthesize
    byte-identical marker streams and both walk the bytes back (the
    oracle unrolls the identical steps as CTEs). This shrinks the codec
    stub to pixel/sample decode only (multimodal/binary.py):
    adversarial truncation/garbage cases in tests/test_multimodal_route.py."""
    from flight_radar_pipeline_spark.multimodal.binary import (
        parse_jpeg_dims,
        with_jpeg_payload,
    )

    docs = load_table(spark, sf_dir, "documents")
    dims = parse_jpeg_dims(with_jpeg_payload(docs))
    return dims.where(F.col("modality") != "text/plain").orderBy("doc_id")
