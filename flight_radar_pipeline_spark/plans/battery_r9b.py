"""Round-9b battery additions — classic series/product analytics
families the battery had not yet covered, each with exact-arithmetic
cross-engine parity:

- lag-k autocorrelation of the daily event series (numerator/denominator
  cross-multiplied into exact bigints — no per-row float deviations);
- weekly cohort retention triangle (first-seen cohorts × week offsets);
- Page–Hinkley drift alarm over micro-exact daily means (running-mean
  deviations folded in t-order — the sequential-fold parity device).

(An RFM and a Gini entry drafted for this module were DROPPED before
registration review — `customer_rfm_segments` (battery_quality.py) and
`customer_revenue_gini` (battery_mining.py) already cover those
families; duplicating them would be registry padding.)

All oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# lag-k autocorrelation of the daily event series (exact bigint)
# --------------------------------------------------------------------------

_ACF_LAGS = [1, 7]

_ACF_ORACLE = f"""
    with ev as (
        select event_type,
               date_diff('day', (select min(cast(ts as date)) from events),
                         cast(ts as date)) as t
        from events
    ), span as (
        select max(t) as tmax from ev
    ), spine as (
        select et.event_type, gs.t
        from (select distinct event_type from ev) et
        cross join (select unnest(generate_series(0,
                        (select tmax from span))) as t) gs
    ), daily as (
        select spine.event_type, spine.t,
               coalesce(cnt.x, 0) as x
        from spine
        left join (select event_type, t, count(*) as x
                   from ev group by 1, 2) cnt
          on cnt.event_type = spine.event_type and cnt.t = spine.t
    ), stats as (
        select event_type, count(*) as tt, sum(x) as s from daily
        group by event_type
    ), dev as (
        select d.event_type, d.t, d.x,
               st.tt * d.x - st.s as dv,
               lead(st.tt * d.x - st.s, 1) over (partition by d.event_type
                                                 order by d.t) as dv1,
               lead(st.tt * d.x - st.s, 7) over (partition by d.event_type
                                                 order by d.t) as dv7
        from daily d join stats st using (event_type)
    )
    select event_type, lag_k, cast(n_pairs as bigint) as n_pairs,
           round(num / (1.0 * den), 6) as acf
    from (
        select event_type,
               1 as lag_k,
               count(dv1) as n_pairs,
               sum(dv * dv1) as num,
               sum(dv * dv) as den
        from dev group by event_type
        union all
        select event_type,
               7 as lag_k,
               count(dv7) as n_pairs,
               sum(dv * dv7) as num,
               sum(dv * dv) as den
        from dev group by event_type
    )
    order by event_type, lag_k
"""


@register("event_type_autocorr", _ACF_ORACLE)
def event_type_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily event-count series
    per type — the "is there day-over-day momentum / a weekly cycle"
    screen beside the harmonic-fit and STL entries. Parity is EXACT:
    with T days, total S, the deviation is restated as the bigint
    T·xₜ − S (scaling by T clears the mean's division), so numerator
    Σ dᵥₜ·dᵥₜ₊ₖ and denominator Σ dᵥₜ² are exact integers and only the
    final ratio divides. The series zero-fills on a dense (type × day)
    spine — a missing day is a 0, not a shortened lag. Plan: one fact
    scan → (type, day) aggregate → tiny spine join → one lead() window
    per type over |days| rows → |types|-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.min(F.to_date("ts")).alias("lo"))
    idx = ev.crossJoin(F.broadcast(lo)).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.col("lo")).alias("t"),
    )
    cnt = idx.groupBy("event_type", "t").agg(F.count(F.lit(1)).alias("x"))
    span = idx.agg(F.max("t").alias("tmax"))
    types = idx.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.col("tmax"))).alias("t"),
    )
    daily = spine.join(cnt, ["event_type", "t"], "left").select(
        "event_type", "t", F.coalesce("x", F.lit(0)).alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("tt"), F.sum("x").alias("s")
    )
    dv = F.col("tt") * F.col("x") - F.col("s")
    w = Window.partitionBy("event_type").orderBy("t")
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "t",
        dv.alias("dv"),
        F.lead(dv, 1).over(w).alias("dv1"),
        F.lead(dv, 7).over(w).alias("dv7"),
    )
    outs = []
    for lag in _ACF_LAGS:
        c = F.col(f"dv{lag}")
        outs.append(
            dev.groupBy("event_type").agg(
                F.lit(lag).alias("lag_k"),
                F.count(c).cast("bigint").alias("n_pairs"),
                F.sum(F.col("dv") * c).alias("num"),
                F.sum(F.col("dv") * F.col("dv")).alias("den"),
            )
        )
    both = outs[0].unionByName(outs[1])
    return both.select(
        "event_type",
        "lag_k",
        "n_pairs",
        F.round(F.col("num") / (1.0 * F.col("den")), 6).alias("acf"),
    ).orderBy("event_type", "lag_k")


# --------------------------------------------------------------------------
# weekly cohort retention triangle
# --------------------------------------------------------------------------

_COHORT_ORACLE = """
    with ev as (
        select user_id,
               date_diff('day', (select min(cast(ts as date)) from events),
                         cast(ts as date)) // 7 as week
        from events
    ), first_seen as (
        select user_id, min(week) as cohort_week from ev group by user_id
    ), sizes as (
        select cohort_week, count(*) as cohort_size
        from first_seen group by cohort_week
    ), active as (
        select distinct f.cohort_week, e.week - f.cohort_week as offset_w,
               e.user_id
        from ev e join first_seen f using (user_id)
    ), tri as (
        select cohort_week, offset_w, count(*) as n_active
        from active group by 1, 2
    )
    select cast(t.cohort_week as bigint) as cohort_week,
           cast(t.offset_w as bigint) as week_offset,
           cast(s.cohort_size as bigint) as cohort_size,
           cast(t.n_active as bigint) as n_active,
           ((20000 * t.n_active + s.cohort_size) // (2 * s.cohort_size))
               / 10000 as retention
    from tri t join sizes s using (cohort_week)
    order by cohort_week, week_offset
"""


@register("customer_cohort_retention", _COHORT_ORACLE)
def customer_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle — the product-analytics
    companion to `user_growth_accounting` (stocks/flows of the whole
    base) and `cohort_cumulative_ltv` (money accumulation by cohort
    age); this one is the ACTIVITY share per cell: users are cohorted
    by their
    first-seen week, and each (cohort, week-offset) cell counts the
    cohort members active that week over the cohort size. Counts are
    exact integers; the single division rounds at the end. Plan: one
    fact scan → per-user min (map-side combinable) → distinct (cohort,
    offset, user) → two small aggregates joined on the ≤|weeks| cohort
    key. At 100 TB the per-user first-seen aggregate is the only
    user-grain shuffle; the triangle itself is |weeks|² rows."""
    ev = load_table(spark, sf_dir, "events")
    lo = ev.agg(F.min(F.to_date("ts")).alias("lo"))
    weeks = ev.crossJoin(F.broadcast(lo)).select(
        "user_id",
        F.floor(F.datediff(F.to_date("ts"), F.col("lo")) / 7).alias("week"),
    )
    first_seen = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        weeks.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("offset_w"),
            "user_id",
        )
        .distinct()
    )
    tri = active.groupBy("cohort_week", "offset_w").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    return (
        tri.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            F.col("offset_w").cast("bigint").alias("week_offset"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.col("n_active").cast("bigint").alias("n_active"),
            # integer half-up rounding to 4dp (see order_rfm_segments)
            F.expr(
                "((20000 * n_active + cohort_size) div (2 * cohort_size))"
                " / 10000"
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --------------------------------------------------------------------------
# Page–Hinkley drift alarm over micro-exact daily means
# --------------------------------------------------------------------------

_PH_DELTA = 0.005   # insensitivity margin (daily-mean units)
_PH_LAMBDA = 1.0    # alarm threshold

_PH_ORACLE = f"""
    with s as (
        select event_type, cast(ts as date) as day,
               round(sum(cast(round(value * 1000000) as bigint))
                     / 1000000.0 / count(*), 6) as x
        from events group by 1, 2
    ), run as materialized (
        select event_type, day, x,
               sum(x) over (partition by event_type order by day
                   rows between unbounded preceding and current row)
                 / (row_number() over (partition by event_type order by day))
                 as xbar_t
        from s
    ), m as materialized (
        select event_type, day,
               sum(x - xbar_t - ({_PH_DELTA}::double))
                   over (partition by event_type order by day
                         rows between unbounded preceding and current row)
                 as m_t
        from run
    ), ph as materialized (
        select event_type, day,
               m_t - min(m_t) over (partition by event_type order by day
                   rows between unbounded preceding and current row) as ph_t
        from m
    )
    select event_type,
           cast(count(*) as bigint) as n_days,
           round(max(ph_t), 6) as max_ph,
           min(case when ph_t > {_PH_LAMBDA}::double
                    then strftime(day, '%Y-%m-%d') end) as alarm_day
    from ph
    group by event_type
    order by event_type
"""


@register("event_value_page_hinkley", _PH_ORACLE)
def event_value_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley upward-drift alarm over the per-type daily mean —
    the sequential-monitoring classic beside CUSUM (PH tracks the
    cumulative deviation from the RUNNING mean, minus an insensitivity
    margin δ, against its own running minimum; PH_t > λ alarms):
    mₜ = Σᵢ≤ₜ (xᵢ − x̄ᵢ − δ), PHₜ = mₜ − min mᵢ. Parity discipline:
    daily means are micro-exact (integer-micro sums, rounded 6dp); the
    running mean is a t-ordered cumulative sum divided by row_number
    (both engines fold the identical doubles in the identical order,
    so every x̄ᵢ, mₜ, PHₜ is bit-identical — the alarm comparison needs
    no rounding grace). First alarm day ties to the natural t-order
    minimum. One |types|-keyed window chain over the |series| daily
    pre-aggregate; nothing fact-sized shuffles."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            / 1_000_000.0
            / F.count(F.lit(1)),
            6,
        ).alias("x")
    )
    w_cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_rn = Window.partitionBy("event_type").orderBy("day")
    run = s.select(
        "event_type",
        "day",
        "x",
        (F.sum("x").over(w_cum) / F.row_number().over(w_rn)).alias("xbar_t"),
    )
    m = run.select(
        "event_type",
        "day",
        F.sum(
            F.col("x") - F.col("xbar_t") - F.lit(_PH_DELTA)
        )
        .over(w_cum)
        .alias("m_t"),
    )
    ph = m.select(
        "event_type",
        "day",
        (F.col("m_t") - F.min("m_t").over(w_cum)).alias("ph_t"),
    )
    return (
        ph.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.max("ph_t"), 6).alias("max_ph"),
            F.min(
                F.when(
                    F.col("ph_t") > _PH_LAMBDA,
                    F.date_format("day", "yyyy-MM-dd"),
                )
            ).alias("alarm_day"),
        )
        .orderBy("event_type")
    )
