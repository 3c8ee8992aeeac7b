"""Round-9d battery additions — three more analytics families with
exact or fold-exact cross-engine parity:

- EWMA control chart over per-type daily micro-exact means: the
  recurrence e ← λx + (1−λ)e is a t-ordered sequential fold, executed
  step-for-step by a Spark ``F.aggregate`` lambda and a DuckDB recursive
  CTE — identical IEEE op sequence, so every smoothed value and every
  band-breach comparison is bit-identical;
- Pareto "vital few" revenue concentration per nation (the smallest
  head of customers holding ≥80% of spend, decided by the exact integer
  inequality 5·cum ≥ 4·total).

(A Kaplan–Meier entry drafted for this module was DROPPED before
registration review — `order_gap_survival` (battery_mining.py) already
covers censored product-limit survival; duplicating the family would be
registry padding.)

All oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# EWMA control chart over per-type daily means
# --------------------------------------------------------------------------

_EWMA_L = 0.25            # dyadic smoothing constant
_EWMA_BANDK = 3.0
# asymptotic EWMA variance factor sqrt(λ/(2−λ)), precomputed once in
# Python and injected as the SAME literal into both engines
_EWMA_SIGF = math.sqrt(_EWMA_L / (2.0 - _EWMA_L))

_EWMA_ORACLE = f"""
    with recursive s as materialized (
        select event_type, cast(ts as date) as day,
               round(sum(cast(round(value * 1000000) as bigint))
                     / 1000000.0 / count(*), 6) as x,
               row_number() over (partition by event_type
                                  order by cast(ts as date)) as rn
        from events group by event_type, cast(ts as date)
    ), bands as materialized (
        -- order-pinned mean/σ: x is 6dp-rounded, so x·10⁶ is an exact
        -- integer; the sums are exact (hugeint), the one divide happens
        -- last — no summation-order sensitivity cross-engine
        select event_type,
               round(cast(sum(xm) as double) / count(*) / 1000000.0, 6)
                   as center,
               round(sqrt(cast(count(*) * sum(cast(xm as hugeint) * xm)
                               - sum(xm) * sum(xm) as double))
                     / count(*) / 1000000.0, 6) as sd
        from (select event_type, cast(round(x * 1000000) as bigint) as xm
              from s)
        group by event_type
    ), walk as (
        select event_type, day, rn, x, x as e from s where rn = 1
        union all
        select s.event_type, s.day, s.rn, s.x,
               ({_EWMA_L}::double) * s.x + ({1.0 - _EWMA_L}::double) * w.e
        from walk w
        join s on s.event_type = w.event_type and s.rn = w.rn + 1
    )
    select w.event_type, strftime(w.day, '%Y-%m-%d') as day, w.x,
           round(w.e, 6) as ewma,
           w.e > b.center + {_EWMA_BANDK}::double * ({_EWMA_SIGF!r}::double)
                            * b.sd
           or
           w.e < b.center - {_EWMA_BANDK}::double * ({_EWMA_SIGF!r}::double)
                            * b.sd
               as breach
    from walk w join bands b using (event_type)
    order by w.event_type, w.day
"""


@register("event_value_ewma_bands", _EWMA_ORACLE)
def event_value_ewma_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (the SPC staple between the Shewhart-style
    anomaly entry and CUSUM/Page–Hinkley): eₜ = λxₜ + (1−λ)eₜ₋₁ over
    the per-type daily micro-exact means, with ±3σ·√(λ/(2−λ)) control
    bands around the series mean. Distinct from `user_value_ewma`
    (battery_ext.py): that entry is the per-user trailing-20-row
    SMOOTHING transform; this is the monitoring CHART — full-history
    recursion, variance-matched control limits, and the breach verdict. Parity discipline: λ = 0.25 and both
    engines execute the SAME recurrence step-for-step — Spark as an
    ``F.aggregate`` left-fold over the day-sorted series array, DuckDB
    as a recursive CTE walking rn+1 — two multiplies and an add per
    step on identical doubles, so eₜ is bit-identical. The band
    center/σ are order-pinned too (round-10 ADVICE fix): x is
    6dp-rounded so x·10⁶ is an exact integer — both engines sum those
    integers exactly (decimal(38,0) ↔ hugeint), take σ from the exact
    integer n·Σxm²−(Σxm)², and divide once in the same op order, so
    the breach comparison runs on identical doubles end-to-end (avg/
    stddev_pop would have been summation-order-sensitive). The band
    factor √(λ/(2−λ)) is precomputed once in Python and injected as
    the same literal into both plans. Per-type series are bounded (|days| rows), so the
    collected fold array is a few hundred elements — the same shape the
    IRLS/pinball trainers pinned; everything before it is one scan and
    a (type, day) aggregate."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(
            F.sum(F.round(F.col("value") * 1_000_000).cast("bigint"))
            / 1_000_000.0
            / F.count(F.lit(1)),
            6,
        ).alias("x")
    )
    # order-pinned band inputs (round-10 ADVICE fix): avg/stddev_pop over
    # doubles are summation-order-sensitive; x is 6dp-rounded so x·10⁶ is
    # an exact integer — sum exactly (decimal(38,0) ↔ hugeint), divide
    # once, and the popσ comes from the exact integer n·Σxm²−(Σxm)²
    xm = F.round(F.col("x") * 1_000_000).cast("bigint")
    bands = (
        s.select("event_type", xm.alias("xm"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xm").cast("decimal(38,0)").alias("s1"),
            F.sum(F.col("xm").cast("decimal(38,0)") * F.col("xm")).alias("s2"),
        )
        .select(
            "event_type",
            F.round(
                F.col("s1").cast("double") / F.col("n") / 1_000_000.0, 6
            ).alias("center"),
            F.round(
                F.sqrt(
                    (
                        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
                    ).cast("double")
                )
                / F.col("n")
                / 1_000_000.0,
                6,
            ).alias("sd"),
        )
    )
    series = s.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("seq")
    )
    lam = F.lit(_EWMA_L)
    one_m = F.lit(1.0 - _EWMA_L)
    folded = series.select(
        "event_type",
        F.aggregate(
            F.slice(F.col("seq"), 2, F.size("seq") - 1),
            F.array(
                F.struct(
                    F.element_at("seq", 1)["day"].alias("day"),
                    F.element_at("seq", 1)["x"].alias("x"),
                    F.element_at("seq", 1)["x"].alias("e"),
                )
            ),
            lambda acc, nxt: F.concat(
                acc,
                F.array(
                    F.struct(
                        nxt["day"].alias("day"),
                        nxt["x"].alias("x"),
                        (
                            lam * nxt["x"]
                            + one_m * F.element_at(acc, -1)["e"]
                        ).alias("e"),
                    )
                ),
            ),
        ).alias("walk"),
    )
    rows = folded.select(
        "event_type", F.explode("walk").alias("w")
    ).select(
        "event_type",
        F.col("w.day").alias("day"),
        F.col("w.x").alias("x"),
        F.col("w.e").alias("e"),
    )
    half = F.lit(_EWMA_BANDK) * F.lit(_EWMA_SIGF) * F.col("sd")
    return (
        rows.join(F.broadcast(bands), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "x",
            F.round("e", 6).alias("ewma"),
            (
                (F.col("e") > F.col("center") + half)
                | (F.col("e") < F.col("center") - half)
            ).alias("breach"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Pareto vital-few revenue concentration per nation
# --------------------------------------------------------------------------

_PARETO_ORACLE = """
    with spend as (
        select o_custkey,
               sum(cast(round(o_totalprice * 100) as bigint)) as cents
        from orders group by o_custkey
    ), nat as (
        select n.n_name, s.cents,
               row_number() over (partition by n.n_name
                                  order by s.cents desc, s.o_custkey) as rk,
               sum(s.cents) over (partition by n.n_name
                   order by s.cents desc, s.o_custkey
                   rows between unbounded preceding and current row) as cum,
               sum(s.cents) over (partition by n.n_name) as tot,
               count(*) over (partition by n.n_name) as n_cust,
               max(s.cents) over (partition by n.n_name) as top1
        from spend s
        join customer c on s.o_custkey = c.c_custkey
        join nation n on c.c_nationkey = n.n_nationkey
    )
    select n_name,
           cast(n_cust as bigint) as n_customers,
           cast(min(case when 5 * cum >= 4 * tot then rk end) as bigint)
               as vital_count,
           ((2000000 * min(case when 5 * cum >= 4 * tot then rk end)
             + n_cust) // (2 * n_cust)) / 1000000 as vital_frac,
           round(top1 / cast(tot as double), 6) as top1_share
    from nat
    group by n_name, n_cust, top1, tot
    order by n_name
"""


@register("customer_pareto_vital_few", _PARETO_ORACLE)
def customer_pareto_vital_few(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto "vital few": per nation, the smallest number of
    top-spending customers holding ≥ 80% of national revenue, the
    fraction of the customer base they are, and the single-largest
    customer's share — the 80/20 audit every account-management review
    runs, and the inverse Lorenz read to `customer_revenue_gini`
    (battery_mining.py): that entry summarizes the whole curve (Gini)
    and reports the top-DECILE's share; this one inverts the question —
    how small is the head that holds 80% — per nation. The ≥80% decision is the
    EXACT integer inequality 5·cum ≥ 4·total on cents (no float share
    crosses the threshold), ranks pin ties on c_custkey, and the vital
    fraction rounds by the integer half-up device. Plan: fact aggregate
    → broadcast dims → one per-nation ranked window → |nations|-row
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    nat = (
        spend.join(F.broadcast(cust), spend["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select("n_name", "o_custkey", "cents")
    )
    w_rank = Window.partitionBy("n_name").orderBy(
        F.col("cents").desc(), F.col("o_custkey")
    )
    w_all = Window.partitionBy("n_name")
    ranked = nat.select(
        "n_name",
        F.row_number().over(w_rank).alias("rk"),
        F.sum("cents")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("cents").over(w_all).alias("tot"),
        F.count(F.lit(1)).over(w_all).alias("n_cust"),
        F.max("cents").over(w_all).alias("top1"),
    )
    vital = F.min(
        F.when(5 * F.col("cum") >= 4 * F.col("tot"), F.col("rk"))
    )
    return (
        ranked.groupBy("n_name", "n_cust", "top1", "tot")
        .agg(vital.alias("vc"))
        .select(
            "n_name",
            F.col("n_cust").cast("bigint").alias("n_customers"),
            F.col("vc").cast("bigint").alias("vital_count"),
            # vc is IntegerType (row_number); widen BEFORE multiplying —
            # 2000000 * int overflows 32 bits once vital_count ≥ 1074
            # (ANSI throw / silent wrap divergence from the oracle's
            # bigint evaluation). round-10 ADVICE fix.
            F.expr(
                "((2000000L * cast(vc as bigint) + n_cust)"
                " div (2 * n_cust)) / 1000000"
            ).alias("vital_frac"),
            F.round(
                F.col("top1") / F.col("tot").cast("double"), 6
            ).alias("top1_share"),
        )
        .orderBy("n_name")
    )
