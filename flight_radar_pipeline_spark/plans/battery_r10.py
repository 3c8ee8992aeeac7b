"""Round-10 battery additions — two families the registry genuinely
lacks (pre-registration sweep per the standing dedup-honesty rule):

- largest-remainder (Hamilton) seat apportionment of a fixed budget by
  nation revenue — the DISCRETE-ALLOCATION family (quota floors + ranked
  remainders), all exact integer arithmetic;
- 2-D skyline / Pareto-dominance frontier over parts (min price, max
  size) — the classic dominance QUERY operator, distinct from the
  registry's 1-D concentration entries (Gini / vital-few / ABC measure
  how concentrated ONE axis is; the skyline returns the non-dominated
  SET under two axes). Runs on the range-partitioned running-max face of
  ``operators/prefix.ranged_cumulative``.

Candidates DROPPED by the sweep before registration (duplicating
existing families would be registry padding): an ordered conversion
funnel (`signup_click_purchase_funnel` + `corpus_filter_funnel` already
cover it), Kendall τ (rank-correlation family: `event_value_spearman`),
a Holt level+trend smoother (`user_value_holt`), an Atkinson inequality
index (inequality family: `customer_revenue_gini`, `customer_pareto_
vital_few`, `part_revenue_abc`), and a Weibull interarrival fit
(distribution-fit family: `order_interarrival_fit`).

All oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# largest-remainder (Hamilton) apportionment of seats by nation revenue
# --------------------------------------------------------------------------

_SEATS = 100

_APPORTION_ORACLE = f"""
    with spend as (
        select n.n_name,
               sum(cast(round(o.o_totalprice * 100) as bigint)) as cents
        from orders o
        join customer c on o.o_custkey = c.c_custkey
        join nation n on c.c_nationkey = n.n_nationkey
        group by n.n_name
    ), q as (
        select n_name, cents,
               cast((cents * {_SEATS}) // (sum(cents) over ())
                    as bigint) as fq,
               cast((cents * {_SEATS}) % (sum(cents) over ())
                    as bigint) as rem
        from spend
    ), r as (
        select n_name, cents, fq, rem,
               row_number() over (order by rem desc, n_name) as rk,
               sum(fq) over () as base
        from q
    )
    select n_name,
           cast(cents as bigint) as revenue_cents,
           fq as quota_floor,
           cast(rk as bigint) as remainder_rank,
           cast(fq + case when rk <= {_SEATS} - base then 1 else 0 end
                as bigint) as seats
    from r
    order by n_name
"""


@register("nation_seat_apportionment", _APPORTION_ORACLE)
def nation_seat_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: divide a fixed budget
    of {seats} "seats" (ad slots, audit samples, capacity units) among
    nations proportionally to revenue — every nation gets the FLOOR of
    its exact quota, and the leftover seats go to the largest remainders
    (ties on n_name). The discrete-allocation staple (UN-style seat
    math, stratified audit sizing, pro-rata budget splits) and a family
    the registry did not cover: unlike the concentration entries this
    must produce an exact-sum integer allocation, where naive per-row
    rounding would over- or under-shoot the budget.

    Exactness: quota floor and remainder are bigint div/mod of
    cents·{seats} against the exact cents total — no doubles anywhere,
    so the allocation (including the Σseats = {seats} invariant) is
    engine-identical by construction. Plan: fact aggregate → broadcast
    dims → windows over the bounded |nations| relation (the
    dimension-bounded class) → one ranked pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    spend = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    w_all = Window.partitionBy()
    q = (
        spend.select(
            "n_name", "cents", F.sum("cents").over(w_all).alias("tot")
        )
        .select(
            "n_name",
            "cents",
            F.expr(f"(cents * {_SEATS}L) div tot").alias("fq"),
            F.expr(f"(cents * {_SEATS}L) % tot").alias("rem"),
        )
    )
    r = q.select(
        "n_name",
        "cents",
        "fq",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("n_name")))
        .alias("rk"),
        F.sum("fq").over(w_all).alias("base"),
    )
    return r.select(
        "n_name",
        F.col("cents").alias("revenue_cents"),
        F.col("fq").alias("quota_floor"),
        F.col("rk").cast("bigint").alias("remainder_rank"),
        (
            F.col("fq")
            + F.when(F.col("rk") <= _SEATS - F.col("base"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    ).orderBy("n_name")


nation_seat_apportionment.__doc__ = nation_seat_apportionment.__doc__.format(
    seats=_SEATS
)


# --------------------------------------------------------------------------
# 2-D skyline (Pareto-dominance frontier): cheapest-and-largest parts
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
    with g as (
        select p_retailprice as price, max(p_size) as smax
        from part group by 1
    ), m as (
        select price, smax,
               max(smax) over (order by price
                               rows between unbounded preceding
                               and 1 preceding) as m1
        from g
    )
    select p.p_partkey, p.p_retailprice as price,
           cast(p.p_size as bigint) as size
    from part p join m on p.p_retailprice = m.price
    where (m1 is null or m1 < p.p_size) and p.p_size = smax
    order by p.p_partkey
"""


@register("part_price_size_skyline", _SKYLINE_ORACLE)
def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (maximal-vector / Pareto-dominance frontier): the
    parts no other part beats on BOTH axes — lower-or-equal price AND
    greater-or-equal size with at least one strict — i.e. the
    value-for-money frontier a buyer actually chooses from. The classic
    dominance-query operator (Börzsönyi et al.'s SKYLINE OF), absent
    from the registry: the concentration entries summarize one axis;
    this returns the non-dominated SET under two.

    The sort-based rewrite makes dominance a RUNNING MAX: a part is
    dominated iff some strictly-cheaper price tier reaches size ≥ s
    (m1 = running max of per-price max-size over strictly-preceding
    prices) or its own price tier holds a strictly larger part
    (s < smax). Both conditions read off the per-price grid — no pair
    join, no O(n²). The running max runs through
    ``operators/prefix.ranged_cumulative``'s ``max_cols`` face (bucket
    partials + broadcast offset maxima), so the price grid — which
    grows with the catalog — never funnels through one task; max is
    associative, making the bucket decomposition exact for ANY
    boundary quality. Equal (price, size) pairs do not strictly
    dominate each other and all stay, matching the SQL predicate."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    g = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("smax")
    )
    m = ranged_cumulative(
        g, "price", [], max_cols=["smax"], materialize_input=True
    ).select("price", "smax", F.col("smax_runmax_prev").alias("m1"))
    return (
        part.join(m, part["p_retailprice"] == m["price"])
        .filter(
            (F.col("m1").isNull() | (F.col("m1") < F.col("p_size")))
            & (F.col("p_size") == F.col("smax"))
        )
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("price"),
            F.col("p_size").cast("bigint").alias("size"),
        )
        .orderBy("p_partkey")
    )
