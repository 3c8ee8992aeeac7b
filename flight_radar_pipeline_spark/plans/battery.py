"""Driver-facing query battery over the synthetic test tables.

Every operator class from the reference inventory (SURVEY.md §2, cited per
query) re-expressed over the TPC-H-ish star schema + events, as
(spark, sf_dir) → DataFrame builders paired with ANSI-SQL oracles that
DuckDB executes over the same parquet — the t2 correctness gate.

Cross-engine determinism rules (verified empirically against DuckDB 1.0):
- double aggregates are rounded in-plan on BOTH sides (partial-agg sum
  order differs between engines; 2dp absorbs it);
- every top-k has a total ordering (value + key tiebreaks);
- timestamps are presented as formatted strings (parquet NANOS / NTZ
  semantics then agree bit-for-bit);
- column names are aliased identically in the DataFrame plan and the SQL.

Scale notes are per-query docstrings: what broadcasts, what shuffles, what
pushes down.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.geo import haversine_km
from flight_radar_pipeline_spark.pipeline.silver import dedup_by_key
from flight_radar_pipeline_spark.sources.readers import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the same tables; None → rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a silent overwrite once served a grid subplan under a public
            # name (round-12 ADVICE); duplicates are always a bug here
            raise ValueError(f"duplicate battery registration: {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


# --------------------------------------------------------------------------
# Build-time subplans of bounded-grain driver-loop entries
# --------------------------------------------------------------------------
# Entries in the sanctioned driver-grid class (markov-stationary, MST,
# isotonic/PAVA, greedy set cover, Bradley–Terry, the GD trainer, k-core)
# run their fact-side work at BUILD time behind a bounded `.collect()` or
# a lineage-truncating `localCheckpoint()`: the DataFrame the driver and
# `tools/plan_audit.py` see is only the final assembly, so the expensive
# fact-scan subplan would otherwise be invisible to the hygiene counters
# and the exchange-budget guard. Each such entry registers its build-time
# subplan(s) here; `tools/plan_audit.py` emits a `name [grid:label]` row
# per subplan and `tests/test_plan_hygiene.py` asserts the categorical
# bans (row-Python, cartesian, unlisted BNLJ) over these plans too.
GRID_PLANS: dict[str, Callable[[SparkSession, str], "dict[str, DataFrame]"]] = {}


def register_grid_plans(name: str):
    """Attach a `(spark, sf_dir) -> {label: DataFrame}` hook exposing the
    pre-collect / pre-checkpoint subplans of a driver-grid entry."""

    def deco(fn: Callable[[SparkSession, str], dict[str, DataFrame]]):
        if name in GRID_PLANS:
            # same silent-overwrite hazard register() guards against
            raise ValueError(f"duplicate grid-plan registration: {name!r}")
        GRID_PLANS[name] = fn
        return fn

    return deco


# --------------------------------------------------------------------------
# Relational core
# --------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    as sum_qty,
           round(sum(l_extendedprice), 2)                               as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            as sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
           round(avg(l_quantity), 2)                                    as avg_qty,
           round(avg(l_extendedprice), 2)                               as avg_price,
           round(avg(l_discount), 4)                                    as avg_disc,
           count(*)                                                     as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→hash-agg (TPC-H Q1 shape; SURVEY §2.5 A1/A2/A6,
    §2.3 P4). Scale: single pass, partial+final hash agg on 2 low-cardinality
    keys — no skew risk; the shipdate predicate pushes to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_nation",
    """
    select n_name, r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           count(*) as lineitem_count
    from lineitem
    join orders   on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation   on c_nationkey = n_nationkey
    join region   on n_regionkey = r_regionkey
    group by n_name, r_name
    order by n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-build analog: fact enriched through a dimension join chain then
    aggregated (SURVEY §2.4 J1-J3). Scale: lineitem⋈orders is the one real
    shuffle (both large, keyed on orderkey); customer/nation/region are
    broadcast so the enriched fact never reshuffles."""
    t = {n: load_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer", "nation", "region")}
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("lineitem_count"),
        )
        .orderBy("n_name")
    )


@register(
    "shipping_priority",
    """
    select l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           strftime(o_orderdate, '%Y-%m-%d') as orderdate_str,
           o_orderpriority
    from customer
    join orders   on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    where c_mktsegment = 'BUILDING'
      and o_orderdate < timestamp '1998-03-15 00:00:00'
      and l_shipdate  > timestamp '1998-03-15 00:00:00'
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue desc, l_orderkey
    limit 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + global top-k (TPC-H Q3 shape; SURVEY §2.6 T1 —
    TakeOrderedAndProject, no global sort materialized). Scale: the two
    date/segment predicates push down to all three scans before the join."""
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "orders", "lineitem")}
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "order_priority_count",
    """
    select o_orderpriority, count(*) as order_count
    from orders
    where o_orderdate >= timestamp '1997-01-01 00:00:00'
      and o_orderdate <  timestamp '1997-04-01 00:00:00'
      and exists (
          select 1 from lineitem
          where l_orderkey = o_orderkey and l_shipdate > o_orderdate
      )
    group by o_orderpriority
    order by o_orderpriority
    """,
)
def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) + group-count (TPC-H Q4 shape) — a join type
    the reference never uses, part of the extended surface (SURVEY §2.4).
    Scale: semi join shuffles only the two key columns of lineitem."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "top3_parts_per_brand",
    """
    with c as (
        select p_brand, p_name, count(*) as cnt
        from lineitem join part on l_partkey = p_partkey
        group by p_brand, p_name
    ), r as (
        select *, row_number() over (
            partition by p_brand order by cnt desc, p_name
        ) as rnk from c
    )
    select p_brand,
           string_agg(p_name, ', ' order by rnk) as top_parts,
           cast(sum(cnt) as bigint) as total_cnt
    from r where rnk <= 3
    group by p_brand
    order by p_brand
    """,
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-group + rank-ordered string join — Q5's exact shape
    (SURVEY §2.6 W1, §2.5 A7) with the deterministic rewrite: rank via
    row_number with tiebreak, list order via array_sort over (rank, name)
    structs instead of arrival-order collect_list."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    counts = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("cnt"), F.asc("p_name"))
    ranked = counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
    return (
        ranked.groupBy("p_brand")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", "p_name"))),
                    lambda s: s["p_name"],
                ),
                ", ",
            ).alias("top_parts"),
            F.sum("cnt").alias("total_cnt"),
        )
        .orderBy("p_brand")
    )


@register(
    "user_click_view_gap",
    """
    with c as (
        select user_id, count(*) as click_count
        from events where event_type = 'click' group by user_id
    ), v as (
        select user_id, count(*) as view_count
        from events where event_type = 'view' group by user_id
    )
    select c.user_id, click_count, view_count,
           abs(click_count - view_count) as gap
    from c join v on c.user_id = v.user_id
    order by gap desc, c.user_id
    limit 5
    """,
)
def user_click_view_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6's exact shape on events: self-join of two degree counts + argmax
    (SURVEY §2.4 J4, §2.9 Q6) — inner join drops one-sided users, preserved.
    Scale: both aggregate sides shuffle on user_id, so AQE plans the final
    join shuffle-free on the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("click_count"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("view_count"))
    )
    return (
        clicks.join(views, "user_id", "inner")
        .withColumn("gap", F.abs(F.col("click_count") - F.col("view_count")))
        .orderBy(F.desc("gap"), F.asc("user_id"))
        .limit(5)
    )


@register(
    "latest_order_per_customer",
    """
    with r as (
        select o_custkey, o_orderkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') as orderdate_str,
               row_number() over (
                   partition by o_custkey
                   order by o_orderdate desc, o_orderkey desc
               ) as rn
        from orders
    )
    select o_custkey, o_orderkey, o_totalprice, orderdate_str
    from r where rn = 1
    order by o_custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup-by-key — the engine's replacement for the
    reference's dropDuplicates (SURVEY §2.3 P6): explicit winner order, same
    output at any partition count."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        dedup_by_key(
            orders,
            ["o_custkey"],
            order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
        )
        .orderBy("o_custkey")
    )


@register(
    "customer_running_total",
    """
    select o_custkey, o_orderkey,
           round(sum(o_totalprice) over (
               partition by o_custkey
               order by o_orderdate, o_orderkey
               rows between unbounded preceding and current row
           ), 2) as running_total
    from orders
    where o_custkey <= 100
    order by o_custkey, o_orderkey
    """,
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window (extended surface; SURVEY §2.6). The explicit
    ROWS frame makes the prefix sum order-deterministic on both engines."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "segment_set_ops",
    """
    select c_custkey from customer where c_mktsegment = 'BUILDING'
    intersect
    select o_custkey from orders where o_totalprice > 150000
    except
    select o_custkey from orders where o_orderstatus = 'F' and o_totalprice > 400000
    order by c_custkey
    """,
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT set operators — absent from the reference entirely
    (SURVEY §2.6 notes none); part of the extended relational surface."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    finished_big = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000)
    ).select(F.col("o_custkey").alias("c_custkey"))
    return building.intersect(big).subtract(finished_big).orderBy("c_custkey")


@register(
    "customer_haversine",
    """
    select c_custkey,
           round(2 * 6371 * asin(sqrt(
               pow(sin((radians(cast(c_custkey % 120 - 60 as double)) - radians(cast(c_custkey % 100 - 50 as double))) / 2), 2)
               + cos(radians(cast(c_custkey % 100 - 50 as double))) * cos(radians(cast(c_custkey % 120 - 60 as double)))
               * pow(sin((radians(cast(c_custkey % 300 - 150 as double)) - radians(cast(c_custkey % 250 - 125 as double))) / 2), 2)
           )), 2) as distance_km
    from customer
    where c_custkey <= 500
    order by c_custkey
    """,
)
def customer_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's haversine (SURVEY §2.7 F2) as a pure column expr over
    synthetic coordinates derived from keys — demonstrates the UDF-free
    distance path against an independent SQL oracle."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    lat1 = (F.col("c_custkey") % 100 - 50).cast("double")
    lon1 = (F.col("c_custkey") % 250 - 125).cast("double")
    lat2 = (F.col("c_custkey") % 120 - 60).cast("double")
    lon2 = (F.col("c_custkey") % 300 - 150).cast("double")
    return c.select(
        "c_custkey",
        F.round(haversine_km(lat1, lon1, lat2, lon2), 2).alias("distance_km"),
    ).orderBy("c_custkey")


@register(
    "hourly_event_counts",
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
def hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form (the Structured Streaming
    surface runs the same plan incrementally — see streaming/). Time
    bucketing via date_trunc; presented as strings for cross-engine parity
    (SURVEY §2.7 F3)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("hour_start", "event_type")
    )


@register(
    "event_props_json",
    """
    select event_type,
           count(*) as n,
           round(avg(cast(json_extract_string(props, '$.k') as double)), 4) as avg_k
    from events
    group by event_type
    order by event_type
    """,
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path over a string column
    (extended surface — the reference has no nested data at all)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.get_json_object("props", "$.k").cast("double")), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "region_nation_rollup",
    """
    select coalesce(r_name, 'ALL') as region_name,
           coalesce(n_name, 'ALL') as nation_name,
           count(*) as customer_count,
           round(sum(c_acctbal), 2) as acctbal_sum
    from customer
    join nation on c_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    group by rollup (r_name, n_name)
    order by region_name, nation_name
    """,
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (extended surface; SURVEY §2.5 notes the
    reference has none). Nulls from the rollup are coalesced to 'ALL' so the
    presentation is engine-agnostic."""
    t = {n: load_table(spark, sf_dir, n) for n in ("customer", "nation", "region")}
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "customer_count",
            "acctbal_sum",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "most_valuable_order",
    """
    select o_orderkey, o_custkey, o_totalprice, o_orderpriority
    from orders
    order by o_totalprice desc, o_orderkey
    limit 1
    """,
)
def most_valuable_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global argmax (SURVEY §2.6 T1-T3): orderBy+limit(1) compiles to
    TakeOrderedAndProject — per-partition top-1 then a driver merge, no
    global sort even at 100 TB."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(1)
    )


@register(
    "supplier_nation_enrich",
    """
    select s_suppkey, s_name, n_name as nation_name,
           coalesce(r_name, 'Unknown') as region_name
    from supplier
    left join nation on s_nationkey = n_nationkey
    left join region on n_regionkey = r_regionkey
    order by s_suppkey
    """,
)
def supplier_nation_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continent-lookup pattern (SURVEY §2.7 F1): broadcast left join +
    coalesce fallback instead of a per-row Python UDF."""
    t = {n: load_table(spark, sf_dir, n) for n in ("supplier", "nation", "region")}
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"), "left")
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"), "left")
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            F.coalesce("r_name", F.lit("Unknown")).alias("region_name"),
        )
        .orderBy("s_suppkey")
    )
