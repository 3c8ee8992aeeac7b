"""Round-9b battery additions:

- Page–Hinkley drift alarm over micro-exact daily means (running-mean
  deviations folded in t-order — the sequential-fold parity device):
  the sequential-monitoring classic beside CUSUM that the drift suite
  lacked.

(Four entries drafted for this module were DROPPED before registration
review because the registry already covers their families —
`customer_rfm_segments` (battery_quality.py), `customer_revenue_gini`
(battery_mining.py), `event_value_lag_autocorr` (battery_mining.py),
and `weekly_cohort_retention` (battery_ext.py); duplicating them would
be registry padding.)

All oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table

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
