"""Round-8 battery additions — the staged round-7 library operators
wrapped as oracled entries (the round-9 driver slate): capped
sessionization, second-digit Benford, probability-calibration report,
DoReMi-style mixture reweighting, the window-builtin parity suite as a
query, IRLS logistic regression, pinball-loss quantile regression,
geographic DBSCAN, end-to-end entity resolution, and the real BMP
pixel-decode hot loop.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently (recursive CTEs for the data-dependent folds,
unrolled CTE chains for the iterative trainers, pixel arithmetic from
the generator's closed form for the decoder). Registered into the
shared REGISTRY on import (see __spark_entry__).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# capped sessionization (gap + max-duration rule)
# --------------------------------------------------------------------------

_SESS_GAP = 30_000      # ~8.3 h: brackets the synthetic ~7.5 h median gap
_SESS_CAP = 86_400      # 1 day max session span — the production cap rule
_SESS_MAXE = 500        # per-user fold bound (documented operator cap)

_SESS_ORACLE = f"""
    with recursive evt as (
        select user_id as user,
               cast(floor(epoch(ts)) as bigint) as t,
               row_number() over (partition by user_id
                                  order by ts, event_id) as rn
        from events
        qualify rn <= {_SESS_MAXE}
    ), rec as (
        select user, rn, t as start, t as last,
               cast(1 as bigint) as ns, cast(0 as bigint) as ngap,
               cast(0 as bigint) as ncap
        from evt where rn = 1
        union all
        select e.user, e.rn,
               case when (e.t - r.last) > {_SESS_GAP}
                      or ((e.t - r.last) <= {_SESS_GAP}
                          and (e.t - r.start) > {_SESS_CAP})
                    then e.t else r.start end,
               e.t,
               r.ns + case when (e.t - r.last) > {_SESS_GAP}
                             or ((e.t - r.last) <= {_SESS_GAP}
                                 and (e.t - r.start) > {_SESS_CAP})
                           then 1 else 0 end,
               r.ngap + case when (e.t - r.last) > {_SESS_GAP}
                             then 1 else 0 end,
               r.ncap + case when (e.t - r.last) <= {_SESS_GAP}
                              and (e.t - r.start) > {_SESS_CAP}
                             then 1 else 0 end
        from rec r join evt e on e.user = r.user and e.rn = r.rn + 1
    )
    select user, cast(rn as bigint) as n_events, ns as n_sessions,
           ngap as n_gap_breaks, ncap as n_cap_breaks
    from rec
    qualify row_number() over (partition by user order by rn desc) = 1
    order by user
"""


@register("user_sessions_capped", _SESS_ORACLE)
def user_sessions_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH an inactivity gap ({gap}s) and a max
    session duration ({cap}s) via ``operators.temporal.sessionize_capped``
    → per user (n_events, n_sessions, n_gap_breaks, n_cap_breaks). The
    duration test depends on the running session START — a
    data-dependent reset no window frame expresses — so the operator
    folds JVM-side with ``F.aggregate`` over the per-user sorted
    timestamp array; the oracle replays the identical recursion as a
    recursive CTE stepping one event per round. All-integer state:
    exact cross-engine parity by construction. One groupBy shuffle,
    state bounded by the documented {maxe}-event cap."""
    from flight_radar_pipeline_spark.operators.temporal import (
        sessionize_capped,
    )

    ev = load_table(spark, sf_dir, "events")
    out = sessionize_capped(
        ev, "user_id", "ts", _SESS_GAP, _SESS_CAP, _SESS_MAXE
    )
    return out.orderBy("user")


user_sessions_capped.__doc__ = user_sessions_capped.__doc__.format(
    gap=_SESS_GAP, cap=_SESS_CAP, maxe=_SESS_MAXE
)


# --------------------------------------------------------------------------
# second-digit Benford screen over line-item prices
# --------------------------------------------------------------------------

_B2_EXP = {
    d: sum(math.log10(1.0 + 1.0 / (10 * d1 + d)) for d1 in range(1, 10))
    for d in range(10)
}

_B2_CASE = (
    "case "
    + " ".join(f"when digit = {d} then {p!r}" for d, p in _B2_EXP.items())
    + " end"
)

_B2_ORACLE = f"""
    with d as (
        select cast(floor(l_extendedprice * 100) as bigint) as cents
        from lineitem
        where cast(floor(l_extendedprice * 100) as bigint) >= 10
    ), obs as (
        select cast(substr(cast(cents as varchar), 2, 1) as int) as digit,
               count(*) as n_obs
        from d group by 1
    ), tot as (
        select cast(sum(n_obs) as double) as total from obs
    )
    select digit, n_obs,
           round(n_obs / total, 6) as obs_freq,
           round({_B2_CASE}, 6) as exp_freq,
           round(pow(n_obs - total * ({_B2_CASE}), 2)
                 / (total * ({_B2_CASE})), 4) as chi2_term
    from obs, tot
    order by digit
"""


@register("lineitem_benford_second_digit", _B2_ORACLE)
def lineitem_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-digit Benford screen (``operators.mining.
    benford_second_digit_fit``) on l_extendedprice — the forensic
    follow-up to the first-digit test (fabricators who know the
    first-digit law rarely match P(d₂)). Digits come from integer cents
    (never double formatting); expectation literals are the exact
    doubles Σ log10(1+1/(10·d₁+d)) produces, mirrored verbatim in the
    oracle. One scan, a ≤10-row aggregate, one 1-row total broadcast —
    flat at any scale."""
    from flight_radar_pipeline_spark.operators.mining import (
        benford_second_digit_fit,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return benford_second_digit_fit(li, "l_extendedprice")


# --------------------------------------------------------------------------
# probability-calibration report (reliability diagram as a relation)
# --------------------------------------------------------------------------

_CAL_BINS = 10

_CAL_ORACLE = f"""
    with s as (
        select round(1 / (1 + exp(-((value - 100.0) / 50.0))), 9) as sc,
               case when event_type = 'purchase' then 1.0 else 0.0 end as y
        from events
    ), b as (
        select least(greatest(sc, 0.0), 1.0) as s2, y,
               least(cast(floor(least(greatest(sc, 0.0), 1.0)
                                * {_CAL_BINS}) as int),
                     {_CAL_BINS - 1}) as bin
        from s
    )
    select bin, cast(count(*) as bigint) as n,
           round(avg(s2), 6) as mean_pred,
           round(avg(y), 6) as frac_pos,
           round(avg(s2) - avg(y), 6) as gap,
           round(avg(pow(s2 - y, 2)), 6) as brier_term
    from b group by bin
    order by bin
"""


@register("event_score_calibration", _CAL_ORACLE)
def event_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram as a relation (``operators.mining.
    calibration_report``): a sigmoid pseudo-probability of 'purchase'
    from the event value, binned into {bins} equal-width score buckets
    with predicted-vs-observed positive rates, per-bin gap, and Brier
    terms — the calibration audit every threshold-consuming classifier
    needs. Scores round to 9 dp BEFORE binning (in both engines) so bin
    assignment and the bin-level averages never depend on JVM Math.exp
    and libm exp agreeing to the last ulp. One scan, a {bins}-row
    aggregate."""
    from flight_radar_pipeline_spark.operators.mining import (
        calibration_report,
    )

    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.round(1 / (1 + F.exp(-((F.col("value") - 100.0) / 50.0))), 9).alias("score"),
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    return calibration_report(scored, "score", "y", n_bins=_CAL_BINS)


event_score_calibration.__doc__ = event_score_calibration.__doc__.format(
    bins=_CAL_BINS
)


# --------------------------------------------------------------------------
# DoReMi-style mixture reweighting over document domains
# --------------------------------------------------------------------------

_DOREMI_ORACLE = """
    with per as (
        select lang, cast(count(*) as bigint) as n_docs,
               round(avg(ln(1 + n_chars)), 6) as loss
        from documents group by lang
    ), base as (
        select round(avg(ln(1 + n_chars)), 6) as b from documents
    ), ex as (
        select lang, n_docs, loss, exp(loss - b) as e from per, base
    ), z as (
        select sum(e) as z from ex
    )
    select lang, n_docs, loss, round(e / z, 6) as weight
    from ex, z
    order by lang
"""


@register_grid_plans("doc_mixture_reweight")
def _mix_grid_plans(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # the corpus-baseline 1-row aggregate collected at build time (the
    # per-lang relation itself re-appears in the final joined plan)
    return {
        "baseline": docs.agg(
            F.round(F.avg(F.log(1 + F.col("n_chars"))), 6).alias("b")
        )
    }


@register("doc_mixture_reweight", _DOREMI_ORACLE)
def doc_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (``operators.mining.
    mixture_reweight_multiplicative``): per-language proxy loss = mean
    ln(1+chars), baseline = corpus mean, one multiplicative-weights step
    from the uniform reference → the softmax tilt that upweights
    domains the proxy is worst on. The per-domain losses are ONE
    corpus-scale aggregate (|langs| rows cross the wire — the
    bounded-driver-action class); the reweighting itself is O(|domains|)
    driver arithmetic by design — it has no business on the cluster.
    Weights rejoin the per-domain relation as a broadcast local table.
    Oracle restates the tilt as exp(excess)/Σ in SQL."""
    from flight_radar_pipeline_spark.operators.mining import (
        mixture_reweight_multiplicative,
    )

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg(F.log(1 + F.col("n_chars"))), 6).alias("loss"),
    )
    base = docs.agg(
        F.round(F.avg(F.log(1 + F.col("n_chars"))), 6).alias("b")
    ).collect()[0]["b"]
    rows = per.orderBy("lang").collect()  # |langs| rows — bounded
    weights = mixture_reweight_multiplicative(
        [(r["lang"], r["loss"], base) for r in rows], eta=1.0, steps=1
    )
    wdf = spark.createDataFrame(
        [(d, round(w, 6)) for d, w in weights], "lang string, weight double"
    )
    return (
        per.join(F.broadcast(wdf), "lang")
        .select("lang", "n_docs", "loss", "weight")
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# window-builtin suite as a query (converts the parity test to an entry)
# --------------------------------------------------------------------------

_WB_MOD = 17  # deterministic 1/17 customer sample keeps the output bounded

_WB_ORACLE = f"""
    select o_custkey, o_orderkey,
           first_value(o_orderkey) over w as first_ok,
           last_value(o_orderkey) over (partition by o_custkey
                order by o_orderdate, o_orderkey
                rows between unbounded preceding
                and unbounded following) as last_ok,
           nth_value(o_orderkey, 2) over (partition by o_custkey
                order by o_orderdate, o_orderkey
                rows between unbounded preceding
                and unbounded following) as second_ok,
           round(percent_rank() over w, 8) as pr,
           round(cume_dist() over w, 8) as cd,
           ntile(4) over w as quartile
    from orders
    where o_custkey % {_WB_MOD} = 0
    window w as (partition by o_custkey order by o_orderdate, o_orderkey)
    order by o_custkey, o_orderkey
"""


@register("orders_window_builtins", _WB_ORACLE)
def orders_window_builtins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window builtins no other entry exercises directly —
    first_value (running frame), last_value / nth_value (full frame:
    the default-frame trap where last_value degenerates to the current
    row), percent_rank, cume_dist, ntile — over per-customer order
    histories with fully-tiebroken orderings, on a deterministic 1/{m}
    customer sample (the filter sits BELOW the window in partition-key
    space, so per-customer results are unchanged — predicate pushes to
    the scan). Promotes tests/test_window_builtin_parity.py's proof
    into a driver-checked entry. One window shuffle on o_custkey."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % _WB_MOD == 0
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w_full).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_ok"),
            F.round(F.percent_rank().over(w), 8).alias("pr"),
            F.round(F.cume_dist().over(w), 8).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


orders_window_builtins.__doc__ = orders_window_builtins.__doc__.format(
    m=_WB_MOD
)
