"""Round-9c battery additions — combinatorial / series families with
exact-arithmetic cross-engine parity:

- greedy set cover of parts by suppliers (k driver-side steps, one
  anti-join + aggregate per step — the IRLS unrolled-materialized-CTE
  oracle discipline);
- Kadane maximum-subarray "hottest streak" per nation over mean-centered
  daily order totals (the prefix-sum restatement on exact bigints).

(Two entries drafted for this module were DROPPED before registration
review because the registry already covers their families —
`session_event_type_lift` (battery_ext.py) and `event_seasonal_baseline`
(battery_mining.py: the seasonal-profile holdout backtest); duplicating
them would be registry padding.)

All oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# greedy set cover: suppliers covering the part universe
# --------------------------------------------------------------------------

_COVER_STEPS = 5

# unrolled greedy steps; each CTE is materialized (the chained-CTE rule —
# back-references must not inline the whole chain)
_COVER_ORACLE_PARTS = ["""
    with pairs as materialized (
        select distinct l_suppkey, l_partkey from lineitem
    ), universe as materialized (
        select count(distinct l_partkey) as total from pairs
    )"""]
for _i in range(1, _COVER_STEPS + 1):
    _not_cov = (
        f"and l_partkey not in (select l_partkey from cov{_i - 1})"
        if _i > 1
        else ""
    )
    _prev_union = (
        f"select l_partkey from cov{_i - 1} union " if _i > 1 else ""
    )
    _COVER_ORACLE_PARTS.append(f""", pick{_i} as materialized (
        select l_suppkey, count(*) as gain
        from pairs where 1=1 {_not_cov}
        group by l_suppkey
        order by gain desc, l_suppkey
        limit 1
    ), cov{_i} as materialized (
        {_prev_union}
        select distinct l_partkey from pairs
        where l_suppkey = (select l_suppkey from pick{_i})
    )""")
_COVER_SELECTS = [
    f"""select {i} as step,
           (select l_suppkey from pick{i}) as s_suppkey,
           (select gain from pick{i}) as gain,
           (select count(*) from cov{i}) as covered,
           round((select count(*) from cov{i})
                 / (1.0 * (select total from universe)), 6) as coverage
    where (select l_suppkey from pick{i}) is not null
    """
    for i in range(1, _COVER_STEPS + 1)
]
_COVER_ORACLE = (
    "".join(_COVER_ORACLE_PARTS)
    + "\n    select cast(step as int) as step, s_suppkey,"
    + " cast(gain as bigint) as gain, cast(covered as bigint) as covered,"
    + " coverage from ("
    + " union all ".join(
        f"select * from ({s})" for s in _COVER_SELECTS
    )
    + ") order by step"
)


def _cover_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-side subplan of `supplier_part_coverage` (hidden from
    the final audited plan by the per-step `localCheckpoint()`): the
    distinct (supplier, part) incidence relation every greedy step
    anti-joins and aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_suppkey", "l_partkey").distinct()


@register_grid_plans("supplier_part_coverage")
def _cover_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    pairs = _cover_pairs(spark, sf_dir)
    step1 = (
        pairs.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("gain"))
        .orderBy(F.col("gain").desc(), F.col("l_suppkey"))
        .limit(1)
    )
    # step i>1 adds one left_anti join against the covered set — same
    # shape plus one hash join; step 1 pins the recurring aggregate
    return {
        "incidence_pairs": pairs,
        "step_pick": step1,
        "universe": pairs.agg(
            F.countDistinct("l_partkey").alias("total")
        ),
    }


@register("supplier_part_coverage", _COVER_ORACLE)
def supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy set cover: which {k} suppliers cover the most parts?
    Each step picks the supplier with the largest count of NOT-yet-
    covered parts (ties on the smaller s_suppkey), adds its parts to
    the covered set, and reports the marginal gain plus cumulative
    coverage — the classic (1−1/e)-approximation, and the shape of
    every "minimum vendors for assortment / minimum probes for
    coverage" question. Spark runs the loop driver-side with one
    anti-join + one aggregate + one 1-row collect per step (O(k) driver
    state — the IRLS discipline, `operators/mining.py` precedent); the
    covered set stays distributed as an isin-filter of the ONE
    checkpointed pair table (parts of any picked supplier), so step
    i+1's plan is flat without a per-step materialization. The oracle unrolls
    the same {k} steps as materialized CTEs. All counts are exact
    integers; the one division (coverage fraction) rounds at 6dp.
    At 100 TB the per-step cost is one shuffle of the (supp, part)
    distinct pairs — greedy set cover is inherently sequential in k,
    but k is small and each step is a full-parallel aggregate."""
    pairs = _cover_pairs(spark, sf_dir).localCheckpoint()
    total = pairs.select("l_partkey").distinct().count()
    picked_keys: list[int] = []
    rows = []
    cum = 0
    for step in range(1, _COVER_STEPS + 1):
        cand = pairs
        if picked_keys:
            # the covered set IS "parts of any picked supplier" — an
            # isin filter over the one checkpointed pair table, so each
            # step's anti-join stays flat without materializing a
            # growing covered chain (the pre-round-13 shape paid one
            # localCheckpoint action per step for the same membership)
            covered = pairs.filter(
                F.col("l_suppkey").isin(picked_keys)
            ).select("l_partkey")
            cand = pairs.join(covered, "l_partkey", "left_anti")
        picked = (
            cand.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("l_suppkey"))
            .limit(1)
            .collect()
        )
        if not picked:  # universe exhausted before k steps (small SFs)
            break
        best = picked[0]
        picked_keys.append(int(best.l_suppkey))
        cum += best.gain
        rows.append((step, int(best.l_suppkey), int(best.gain), cum))
    out = spark.createDataFrame(
        rows, "step int, s_suppkey bigint, gain bigint, covered bigint"
    )
    return out.select(
        "step",
        "s_suppkey",
        "gain",
        "covered",
        F.round(F.col("covered") / (1.0 * F.lit(total)), 6).alias(
            "coverage"
        ),
    ).orderBy("step")


supplier_part_coverage.__doc__ = supplier_part_coverage.__doc__.format(
    k=_COVER_STEPS
)


# --------------------------------------------------------------------------
# Kadane hottest streak per nation (max subarray of centered dailies)
# --------------------------------------------------------------------------

_KADANE_ORACLE = """
    with ord as (
        select c.c_nationkey,
               date_diff('day',
                   (select min(cast(o_orderdate as date)) from orders),
                   cast(o_orderdate as date)) as t,
               cast(round(o.o_totalprice * 100) as bigint) as cents
        from orders o join customer c on o.o_custkey = c.c_custkey
    ), spine as (
        select n.n_nationkey, n.n_name, gs.t
        from nation n
        cross join (select unnest(generate_series(0,
                        (select max(t) from ord))) as t) gs
    ), daily as materialized (
        select spine.n_name, spine.t, coalesce(sum(ord.cents), 0) as x
        from spine left join ord
          on ord.c_nationkey = spine.n_nationkey and ord.t = spine.t
        group by 1, 2
    ), stats as (
        select n_name, count(*) as tt, sum(x) as s from daily group by 1
    ), pre as materialized (
        select d.n_name, d.t,
               sum(st.tt * d.x - st.s) over (partition by d.n_name
                   order by d.t rows between unbounded preceding
                   and current row) as p
        from daily d join stats st using (n_name)
    ), best as materialized (
        select n_name, t, p,
               p - least(coalesce(min(p) over (partition by n_name
                       order by t rows between unbounded preceding
                       and 1 preceding), 0), 0) as gain
        from pre
    ), top as materialized (
        select n_name, t as end_t, gain,
               p - gain as floor_p
        from best
        qualify row_number() over (partition by n_name
                                   order by gain desc, t) = 1
    ), start as (
        select top.n_name, top.end_t, top.gain,
               coalesce(min(pre.t) + 1, 0) as start_t
        from top left join pre
          on pre.n_name = top.n_name and pre.t < top.end_t
             and pre.p = top.floor_p
        group by 1, 2, 3
    )
    select n_name,
           cast(start_t as bigint) as start_t,
           cast(end_t as bigint) as end_t,
           cast(end_t - start_t + 1 as bigint) as streak_days,
           cast(gain as bigint) as scaled_gain
    from start
    order by n_name
"""


@register("customer_kadane_window", _KADANE_ORACLE)
def customer_kadane_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hottest revenue streak per nation — Kadane's maximum-subarray
    over the MEAN-CENTERED daily order totals, restated for SQL as the
    prefix-sum identity: best window ending at t = Pₜ − min(0, min_{j<t}
    Pⱼ). Centering reuses the bigint device from the autocorrelation
    entry (yₜ = T·xₜ − S clears the mean's division, so every prefix
    sum is an exact integer and the argmax has no float in it); ties
    pin on the earliest end day, and the streak start is the earliest
    prefix row attaining the floor (0 rows ⇒ the series start). The
    answer is the contiguous run of days most above the nation's own
    average — "when was this market hottest, and for how long".

    Plan: fact scan → (nation, day) aggregate zero-filled on a dense
    spine → ONE per-nation window pass. The streak start needs the
    ARGMIN of the prefix minimum, which a join-back would recompute the
    whole upstream for (the first cut of this entry did exactly that —
    50 exchanges); instead the running ``min(struct(p, t))`` carries
    (floor value, earliest index attaining it) through the same sorted
    window, so the argmin is free and the plan is a single
    exchange-on-nation window chain. The per-nation totals (T, S) also
    come from windows over the same partitioning — Spark reuses the one
    exchange+sort for all of them. The oracle keeps the join-back
    formulation; identical bigints make the two restatements
    hash-equal."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    anchor = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    ords = (
        orders.crossJoin(F.broadcast(anchor))
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_nationkey",
            F.datediff(F.to_date("o_orderdate"), F.col("lo")).alias("t"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "cents"
            ),
        )
    )
    spine = (
        nation.crossJoin(F.broadcast(anchor))
        .select(
            "n_nationkey",
            "n_name",
            F.explode(
                F.sequence(F.lit(0), F.datediff(F.col("hi"), F.col("lo")))
            ).alias("t"),
        )
    )
    cnt = ords.groupBy("c_nationkey", "t").agg(F.sum("cents").alias("xs"))
    daily = (
        spine.join(
            cnt,
            (spine["n_nationkey"] == cnt["c_nationkey"])
            & (spine["t"] == cnt["t"]),
            "left",
        )
        .select(
            "n_name",
            spine["t"].alias("t"),
            F.coalesce("xs", F.lit(0)).alias("x"),
        )
    )
    w_nat = Window.partitionBy("n_name")
    w_cum = Window.partitionBy("n_name").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.partitionBy("n_name").orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    stats = daily.select(
        "n_name",
        "t",
        "x",
        F.count(F.lit(1)).over(w_nat).alias("tt"),
        F.sum("x").over(w_nat).alias("s"),
    )
    pre = stats.select(
        "n_name",
        "t",
        F.sum(F.col("tt") * F.col("x") - F.col("s")).over(w_cum).alias("p"),
    )
    # running min(struct(p, t)) = (floor value, EARLIEST index attaining
    # it) — lexicographic struct ordering gives the argmin tiebreak the
    # oracle's join-back + min(t) expresses
    mprev = F.min(F.struct(F.col("p"), F.col("t"))).over(w_prev)
    best = pre.select(
        "n_name",
        "t",
        "p",
        (
            F.col("p")
            - F.least(F.coalesce(mprev["p"], F.lit(0)), F.lit(0))
        ).alias("gain"),
        F.when(
            mprev["p"].isNull() | (mprev["p"] > 0), F.lit(0)
        )
        .otherwise(mprev["t"] + 1)
        .alias("start_t"),
    )
    top = (
        best.select(
            "n_name",
            "t",
            "gain",
            "start_t",
            F.row_number()
            .over(
                Window.partitionBy("n_name").orderBy(
                    F.col("gain").desc(), F.col("t")
                )
            )
            .alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
    )
    return top.select(
        "n_name",
        F.col("start_t").cast("bigint").alias("start_t"),
        F.col("t").cast("bigint").alias("end_t"),
        (F.col("t") - F.col("start_t") + 1)
        .cast("bigint")
        .alias("streak_days"),
        F.col("gain").cast("bigint").alias("scaled_gain"),
    ).orderBy("n_name")
