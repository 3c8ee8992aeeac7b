"""Round-7h battery additions — closing the round-8 rotation slate:
Simpson's-paradox detection (pooled vs per-group regression sign),
a blocked Wald–Wolfowitz runs test (temporal randomness of the value
stream), the first-harmonic diurnal fit (closed-form Fourier
regression on the hourly series), char-shingle diversity (the
compressibility-proxy quality rule), an SPRT sequential A/B decision
walk, and an exponential fit + KS distance for order interarrivals.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently. Registered into the shared REGISTRY on import
(see __spark_entry__).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash
from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.plans.battery_prep import _unit_hash_sql
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# Simpson's-paradox check: pooled vs per-brand discount elasticity
# --------------------------------------------------------------------------

_SIMPSON_ORACLE = """
    with j as (
        select p_brand,
               l_discount::decimal(14,6) as x,
               l_quantity::decimal(14,6) as y
        from lineitem join part on l_partkey = p_partkey
    ), g as (
        select p_brand, count(*) as n,
               sum(x)::double as sx, sum(y)::double as sy,
               sum(x * x)::double as sxx, sum(x * y)::double as sxy
        from j group by 1
    ), slopes as (
        select p_brand,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) as slope
        from g
    ), pooled as (
        select round((sum(n) * sum(sxy * 1.0) - sum(sx) * sum(sy))
                     / (sum(n) * sum(sxx * 1.0) - sum(sx) * sum(sx)), 6)
                   as pooled_slope
        from g
    )
    select p.pooled_slope,
           cast(count(*) as bigint) as n_brands,
           cast(sum(case when s.slope > 0 then 1 else 0 end) as bigint)
               as n_positive,
           cast(sum(case when s.slope < 0 then 1 else 0 end) as bigint)
               as n_negative,
           cast(sum(case when (s.slope > 0) != (p.pooled_slope > 0)
                         then 1 else 0 end) as bigint) as n_sign_reversed
    from slopes s, pooled p
    group by p.pooled_slope
"""


@register("brand_simpson_check", _SIMPSON_ORACLE)
def brand_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector → one row (pooled_slope, n_brands,
    n_positive, n_negative, n_sign_reversed): the POOLED discount→
    quantity regression slope against each brand's WITHIN-GROUP slope —
    when most groups trend one way and the pooled line the other, the
    aggregate is confounded by group composition and any decision made
    on it inverts under segmentation. The guardrail query every
    aggregate-level dashboard metric should ship with.

    Parity: same decimal-exact sufficient statistics as
    `brand_discount_elasticity` (per-group AND pooled slopes both
    derive from the same five exact sums — the pooled line is computed
    from the per-group partials, never a second fact scan). One
    broadcast dim join + one map-side-combinable aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_discount").cast("decimal(14,6)").alias("x"),
        F.col("l_quantity").cast("decimal(14,6)").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slopes = g.select(
        "p_brand",
        F.round(
            (n * F.col("sxy") - sx * sy) / (n * F.col("sxx") - sx * sx), 6
        ).alias("slope"),
    )
    pooled = g.agg(
        F.round(
            (
                F.sum("n") * F.sum(F.col("sxy") * 1.0)
                - F.sum("sx") * F.sum("sy")
            )
            / (
                F.sum("n") * F.sum(F.col("sxx") * 1.0)
                - F.sum("sx") * F.sum("sx")
            ),
            6,
        ).alias("pooled_slope")
    )
    return (
        slopes.crossJoin(F.broadcast(pooled))
        .groupBy("pooled_slope")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_brands"),
            F.sum(F.when(F.col("slope") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_positive"),
            F.sum(F.when(F.col("slope") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
            F.sum(
                F.when(
                    (F.col("slope") > 0) != (F.col("pooled_slope") > 0), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sign_reversed"),
        )
        .select(
            "pooled_slope", "n_brands", "n_positive", "n_negative",
            "n_sign_reversed",
        )
    )


# --------------------------------------------------------------------------
# blocked Wald–Wolfowitz runs test (per-user, pooled z)
# --------------------------------------------------------------------------

_RUNS_ORACLE = """
    with med as (
        select min(value) as m from (
            select value,
                   sum(cnt) over (order by value
                                  rows between unbounded preceding
                                  and current row) as cum,
                   sum(cnt) over () as n
            from (select value, count(*) as cnt from events group by 1)
        ) where cum * 2 >= n
    ), seq as (
        select user_id,
               case when value > (select m from med) then 1 else 0 end as hi,
               lag(case when value > (select m from med) then 1 else 0 end)
                   over (partition by user_id order by ts, event_id) as prev
        from events
    ), per_user as (
        select user_id,
               sum(case when prev is null or hi != prev then 1 else 0 end)
                   as runs,
               sum(hi) as n1, sum(1 - hi) as n0
        from seq group by user_id
        having sum(hi) > 0 and sum(1 - hi) > 0
    ), tot as (
        select cast(count(*) as bigint) as n_users,
               cast(sum(runs) as bigint) as n_runs,
               sum(2.0 * n1 * n0 / (n1 + n0) + 1) as e_runs,
               sum(2.0 * n1 * n0 * (2.0 * n1 * n0 - n1 - n0)
                   / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))) as v_runs
        from per_user
    )
    select n_users, n_runs, round(e_runs, 4) as expected_runs,
           round((n_runs - e_runs) / sqrt(v_runs), 4) as z
    from tot
"""


@register("event_value_runs_test", _RUNS_ORACLE)
def event_value_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Wald–Wolfowitz runs test → one row (n_users, n_runs,
    expected_runs, z): each user's event stream becomes a binary
    above/below-global-median sequence; runs count within users and the
    z pools the per-user moments (users are independent blocks, so
    expectations and variances ADD — the blocked form that never needs
    a global sequence). z ≪ 0 means values cluster in streaks
    (autocorrelated sessions); z ≫ 0 means alternation — either way
    the i.i.d. assumption behind the battery's per-event tests is
    violated and this entry says so.

    Scale: the median comes from the distinct-value cumulative
    pre-aggregate (Mann–Whitney shape); the only fact-sized work is the
    per-user lag window (the established sessionization cost); moments
    are one (user)-grain aggregate then one row."""
    ev = load_table(spark, sf_dir, "events")
    dist = ev.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    # range-partitioned running count for the median (round-10: the
    # distinct-value grid grows with the data) - identity on exact counts
    med_df = (
        # round-11: probe-reuse checkpoint (wash at sf0.1 - 0.95/1.02 vs
        # 0.98/1.08 s - but removes a redundant fact scan at scale)
        ranged_cumulative(
            dist, "value", ["cnt"], with_totals=True,
            materialize_input=True,
        )
        .filter(F.col("cnt_cum") * 2 >= F.col("cnt_tot"))
        .agg(F.min("value").alias("m"))
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.crossJoin(F.broadcast(med_df)).select(
        "user_id",
        F.when(F.col("value") > F.col("m"), 1).otherwise(0).alias("hi"),
        F.lag(
            F.when(F.col("value") > F.col("m"), 1).otherwise(0)
        )
        .over(w_u)
        .alias("prev"),
    )
    per_user = (
        seq.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("hi") != F.col("prev")), 1
                ).otherwise(0)
            ).alias("runs"),
            F.sum("hi").alias("n1"),
            F.sum(1 - F.col("hi")).alias("n0"),
        )
        .filter((F.col("n1") > 0) & (F.col("n0") > 0))
    )
    n1, n0 = F.col("n1"), F.col("n0")
    tot = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("runs").cast("bigint").alias("n_runs"),
        F.sum(2.0 * n1 * n0 / (n1 + n0) + 1).alias("e_runs"),
        F.sum(
            2.0
            * n1
            * n0
            * (2.0 * n1 * n0 - n1 - n0)
            / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1.0))
        ).alias("v_runs"),
    )
    return tot.select(
        "n_users",
        "n_runs",
        F.round(F.col("e_runs"), 4).alias("expected_runs"),
        F.round(
            (F.col("n_runs") - F.col("e_runs")) / F.sqrt(F.col("v_runs")), 4
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# first-harmonic diurnal fit (closed-form Fourier regression)
# --------------------------------------------------------------------------

_HARM_ORACLE = """
    with hourly as (
        select date_trunc('hour', ts) as h,
               extract(hour from ts) as hod,
               cast(round(avg(value) * 1e6) as bigint) as vmu
        from events group by 1, 2
    ), terms as (
        select vmu / 1e6 as v,
               cos(2 * pi() * hod / 24.0) as c,
               sin(2 * pi() * hod / 24.0) as s
        from hourly
    ), sums as (
        select count(*) as n, round(sum(v), 6) as sv,
               round(sum(v * c), 6) as svc, round(sum(v * s), 6) as svs,
               round(sum(c * c), 6) as scc, round(sum(s * s), 6) as sss,
               round(sum(v * v), 6) as svv
        from terms
    )
    select cast(n as bigint) as n_hours,
           round(sv / n, 4) as mean_value,
           round(svc / scc, 4) as a_cos,
           round(svs / sss, 4) as b_sin,
           round(sqrt((svc / scc) * (svc / scc)
                      + (svs / sss) * (svs / sss)), 4) as amplitude,
           round(((svc / scc) * (svc / scc) * scc
                  + (svs / sss) * (svs / sss) * sss)
                 / (svv - sv * sv / n), 4) as r2
    from sums
"""


@register("event_hourly_harmonic_fit", _HARM_ORACLE)
def event_hourly_harmonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-harmonic diurnal fit → one row (n_hours, mean_value,
    a_cos, b_sin, amplitude, r2): closed-form least squares of the
    hourly mean-value series on cos/sin at the 24-hour period — the
    PARAMETRIC companion to `event_hourly_stl_decompose`'s 24 free
    seasonal indices: two coefficients give amplitude and (via
    atan2(b, a)) peak hour, and r² says how much of the hourly variance
    one sinusoid explains. Over whole days the regressors are
    orthogonal to the intercept and each other (Σcos = Σsin =
    Σcos·sin = 0 across full cycles), which is what makes the
    per-regressor closed form exact — documented design assumption.

    Parity: the hourly series quantizes to integer micro-units first
    (the STL discipline); every cross-row sum rounds to 6 before the
    coefficient arithmetic. One fact aggregate + O(hours) arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), F.hour("ts").alias("hod")
    ).agg(F.round(F.avg("value") * 1e6).cast("long").alias("vmu"))
    two_pi = 2 * math.pi
    terms = hourly.select(
        (F.col("vmu") / 1e6).alias("v"),
        F.cos(F.lit(two_pi) * F.col("hod") / 24.0).alias("c"),
        F.sin(F.lit(two_pi) * F.col("hod") / 24.0).alias("s"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 6).alias("sv"),
        F.round(F.sum(F.col("v") * F.col("c")), 6).alias("svc"),
        F.round(F.sum(F.col("v") * F.col("s")), 6).alias("svs"),
        F.round(F.sum(F.col("c") * F.col("c")), 6).alias("scc"),
        F.round(F.sum(F.col("s") * F.col("s")), 6).alias("sss"),
        F.round(F.sum(F.col("v") * F.col("v")), 6).alias("svv"),
    )
    n = F.col("n")
    a = F.col("svc") / F.col("scc")
    b = F.col("svs") / F.col("sss")
    return sums.select(
        n.cast("bigint").alias("n_hours"),
        F.round(F.col("sv") / n, 4).alias("mean_value"),
        F.round(a, 4).alias("a_cos"),
        F.round(b, 4).alias("b_sin"),
        F.round(F.sqrt(a * a + b * b), 4).alias("amplitude"),
        F.round(
            (a * a * F.col("scc") + b * b * F.col("sss"))
            / (F.col("svv") - F.col("sv") * F.col("sv") / n),
            4,
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# char-shingle diversity (compressibility-proxy quality rule)
# --------------------------------------------------------------------------

_SHINGLE_N = 4
_SHINGLE_FLAG = 0.2

_SHINGLE_ORACLE = f"""
    with d as (
        select lang,
               len(list_distinct([substr(lower(text), i, {_SHINGLE_N})
                    for i in range(1, length(text) - {_SHINGLE_N - 2})]))
                   as n_distinct,
               greatest(length(text) - {_SHINGLE_N - 1}, 1) as n_total
        from documents
    ), f as (
        select lang, round(n_distinct / (n_total * 1.0), 6) as diversity
        from d
    )
    select lang, cast(count(*) as bigint) as n_docs,
           round(avg(diversity), 4) as avg_diversity,
           cast(sum(case when diversity < {_SHINGLE_FLAG} then 1 else 0 end)
                as bigint) as n_flagged
    from f group by lang order by lang
"""


@register("doc_shingle_diversity", _SHINGLE_ORACLE)
def doc_shingle_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-shingle diversity → (lang, n_docs, avg_diversity,
    n_flagged): distinct {_SHINGLE_N}-char shingles over total per
    document — the cheap compressibility proxy (a document gzip would
    crush scores low) behind Gopher/C4-style 'mostly repeated content'
    rules; n_flagged counts documents under the {_SHINGLE_FLAG}
    threshold. Pure array expressions (transform + array_distinct) at
    scan speed — the shingle list never leaves its row, so cost is
    linear in characters with zero shuffle before the |langs|
    aggregate. Per-doc ratios round to 6 before the round-4 means.

    `lower(text)` is HOISTED into its own projection before the
    transform: a function call inside a higher-order-function lambda is
    re-evaluated per element (no CSE across lambda iterations), which
    made the original shape O(len²) per document — the round-13 fix
    halved the entry's wall (3.35 → 1.67 s at sf0.1). The lambda body
    now only references the pre-lowered attribute, while n_total and
    the position bound stay keyed on the ORIGINAL text's length exactly
    as the oracle states them (lowercasing can change codepoint counts
    — e.g. İ → i + U+0307 — so length(__lo) is NOT a substitute)."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = docs.select(
        "lang", F.length("text").alias("__n"), F.lower("text").alias("__lo")
    )
    d = lowered.select(
        "lang",
        F.when(
            F.col("__n") >= _SHINGLE_N,
            F.size(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(__n - {_SHINGLE_N - 1}, 1)),"
                        f" i -> substring(__lo, i, {_SHINGLE_N}))"
                    )
                )
            ),
        ).otherwise(0).alias("n_distinct"),
        F.greatest(
            F.col("__n") - (_SHINGLE_N - 1), F.lit(1)
        ).alias("n_total"),
    )
    f = d.select(
        "lang",
        F.round(
            F.col("n_distinct") / (F.col("n_total") * F.lit(1.0)), 6
        ).alias("diversity"),
    )
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("diversity"), 4).alias("avg_diversity"),
            F.sum(
                F.when(F.col("diversity") < _SHINGLE_FLAG, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# SPRT sequential A/B decision walk
# --------------------------------------------------------------------------

_SPRT_P0 = 0.19
_SPRT_P1 = 0.21
_SPRT_BOUND = math.log(19.0)  # alpha = beta = 0.05

_SPRT_ORACLE = f"""
    with b_arm as (
        select cast(ts as date) as day,
               count(*) as n_events,
               sum(case when event_type = 'purchase' then 1 else 0 end)
                   as n_purch
        from events
        where {_unit_hash_sql("user_id::varchar", "sprt")} >= 0.5
        group by 1
    ), walk as (
        select day, n_events, n_purch,
               round(sum(n_purch * ln({_SPRT_P1} / {_SPRT_P0})
                         + (n_events - n_purch)
                           * ln((1 - {_SPRT_P1}) / (1 - {_SPRT_P0})))
                     over (order by day
                           rows between unbounded preceding
                           and current row), 6) as cum_llr
        from b_arm
    )
    select strftime(day, '%Y-%m-%d') as day,
           cast(n_events as bigint) as n_events,
           cast(n_purch as bigint) as n_purchases,
           cum_llr,
           case when cum_llr >= {_SPRT_BOUND!r} then 'accept_h1'
                when cum_llr <= {-_SPRT_BOUND!r} then 'accept_h0'
                else 'continue' end as decision
    from walk order by 1
"""


@register("ab_sprt_daily_decision", _SPRT_ORACLE)
def ab_sprt_daily_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPRT sequential A/B decision walk → (day, n_events, n_purchases,
    cum_llr, decision): Wald's sequential probability ratio test on the
    hash-assigned B arm's daily purchase conversions — H₀ p = {p0} vs
    H₁ p = {p1}, boundaries ±ln 19 (α = β = 0.05). The cumulative
    log-likelihood walk is what lets an experiment STOP the day the
    evidence suffices instead of at a fixed horizon, with error rates
    still controlled — the sequential complement to the battery's
    fixed-horizon A/B entries (t, CUPED, bootstrap, BH). Each day's
    row shows the walk position and the decision a monitor reading it
    that day would take.

    Scale: one filtered fact aggregate to |days| rows; the walk is a
    cumulative window over that relation. Arm assignment is the
    deterministic unit hash, mirrored bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.filter(unit_hash("user_id", "sprt") >= 0.5)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purch"),
        )
    )
    la = math.log(_SPRT_P1 / _SPRT_P0)
    lb = math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))
    w_cum = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = b.select(
        "day",
        "n_events",
        "n_purch",
        F.round(
            F.sum(
                F.col("n_purch") * F.lit(la)
                + (F.col("n_events") - F.col("n_purch")) * F.lit(lb)
            ).over(w_cum),
            6,
        ).alias("cum_llr"),
    )
    return walk.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_purch").cast("bigint").alias("n_purchases"),
        "cum_llr",
        F.when(F.col("cum_llr") >= _SPRT_BOUND, "accept_h1")
        .when(F.col("cum_llr") <= -_SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


ab_sprt_daily_decision.__doc__ = ab_sprt_daily_decision.__doc__.format(
    p0=_SPRT_P0, p1=_SPRT_P1
)

# --------------------------------------------------------------------------
# order interarrival exponential fit + KS distance
# --------------------------------------------------------------------------

_IAT_ORACLE = """
    with gaps as (
        select cast(date_diff('day',
                    lag(o_orderdate) over (partition by o_custkey
                                           order by o_orderdate, o_orderkey),
                    o_orderdate) as bigint) as gap_days
        from orders
    ), g as (
        select gap_days from gaps where gap_days is not null
    ), lam as (
        select count(*) as n, round(avg(gap_days * 1.0), 6) as mean_gap
        from g
    ), dist as (
        select gap_days, count(*) as cnt from g group by 1
    ), cum as (
        select gap_days,
               sum(cnt) over (order by gap_days
                              rows between unbounded preceding
                              and current row) as cum
        from dist
    ), ks as (
        select max(abs(cum / (l.n * 1.0)
                   - (1 - exp(-(gap_days + 1) / l.mean_gap)))) as d
        from cum, lam l
    )
    select cast(l.n as bigint) as n_gaps,
           l.mean_gap as mean_gap_days,
           round(1 / l.mean_gap, 6) as lambda_per_day,
           round(k.d, 4) as ks_distance
    from lam l, ks k
"""


@register("order_interarrival_fit", _IAT_ORACLE)
def order_interarrival_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order interarrival exponential fit → one row (n_gaps,
    mean_gap_days, lambda_per_day, ks_distance): per-customer gaps
    between consecutive orders pooled, the MLE rate λ = 1/mean, and the
    Kolmogorov–Smirnov distance between the empirical gap CDF and the
    fitted exponential (evaluated at day+1, the right edge of each
    integer-day bin) — small D means a memoryless purchase process
    (Poisson ordering holds, so capacity models built on it are safe);
    large D means clumping the rate models miss (cf. the Fano
    burstiness entry on the ARRIVAL side — this is the GAP side).

    Scale: gaps come from the per-customer lag window (sessionization
    cost); the CDF comparison runs on the distinct-gap-day relation —
    bounded by the date range, not the order count. Counts and gaps
    are exact integers; the two transcendental steps (exp) are
    single-expression identical on both engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w_c = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w_c)),
        )
        .cast("bigint")
        .alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    lam = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("gap_days") * 1.0), 6).alias("mean_gap"),
    )
    dist = gaps.groupBy("gap_days").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy().orderBy("gap_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dist.select(
        "gap_days", F.sum("cnt").over(w_cum).alias("cum")
    )
    ks = cum.crossJoin(F.broadcast(lam)).agg(
        F.max(
            F.abs(
                F.col("cum") / (F.col("n") * F.lit(1.0))
                - (
                    1
                    - F.exp(
                        -(F.col("gap_days") + 1) / F.col("mean_gap")
                    )
                )
            )
        ).alias("d")
    )
    return lam.crossJoin(F.broadcast(ks)).select(
        F.col("n").cast("bigint").alias("n_gaps"),
        F.col("mean_gap").alias("mean_gap_days"),
        F.round(1 / F.col("mean_gap"), 6).alias("lambda_per_day"),
        F.round(F.col("d"), 4).alias("ks_distance"),
    )
