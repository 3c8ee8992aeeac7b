"""Round-7d battery additions: a logistic-regression domain classifier
trained with UNROLLED full-batch gradient descent (the CCNet/GPT-3
quality-classifier shape: positive class = target domain, scored by
AUC via the rank identity), classical additive seasonal decomposition
(STL-lite: centered-MA trend, hour-of-day seasonal indices, remainder),
two-feature Mahalanobis outlier detection (the multivariate companion
to the z-score/MAD entries), and the stationary distribution of the
event-type Markov chain by unrolled power iteration.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently. Registered into the shared REGISTRY on import
(see __spark_entry__).
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
# Logistic-regression domain classifier via unrolled gradient descent
# --------------------------------------------------------------------------

_LR_BUCKETS = 64   # shared with the DSIR entry's hashed feature space
_LR_STEPS = 6
# features: f1 = ln(1 + n_chars); f2 = per-doc mean hashed-unigram LLR
# (the DSIR importance score) — both standardized before GD


def _lr_feature_sql() -> str:
    """Feature + standardization CTE prefix shared by the oracle."""
    return f"""
    with tok as (
        select doc_id, lang,
               ('0x' || substr(md5(unnest(
                   regexp_split_to_array(trim(text), '\\s+'))), 1, 6))::bigint
                 % {_LR_BUCKETS} as bucket
        from documents
    ), bc as (
        select bucket, count(*) as n_r,
               sum(case when lang = 'en' then 1 else 0 end) as n_t
        from tok group by bucket
    ), tots as (
        select sum(n_r) as tr, sum(n_t) as tt from bc
    ), llr as (
        select bucket,
               round(ln(((n_t + 1) / (tt + {_LR_BUCKETS}.0))
                        / ((n_r + 1) / (tr + {_LR_BUCKETS}.0))), 6) as w
        from bc, tots
    ), fx as (
        select t.doc_id, round(sum(l.w) / count(*), 6) as f2
        from tok t join llr l using (bucket) group by t.doc_id
    ), feat as (
        select d.doc_id, case when d.lang = 'en' then 1 else 0 end as y,
               round(ln(1 + d.n_chars), 6) as f1, fx.f2
        from documents d join fx using (doc_id)
    ), st as (
        select avg(f1) as m1, stddev_pop(f1) as s1,
               avg(f2) as m2, stddev_pop(f2) as s2
        from feat
    ), z as (
        select doc_id, y, round((f1 - m1) / s1, 6) as z1,
               round((f2 - m2) / s2, 6) as z2
        from feat, st
    ), ws0 as (
        select 0.0 as a, 0.0 as b, 0.0 as c
    )"""


def _lr_oracle() -> str:
    """Six GD steps unrolled as CTE pairs (gradient aggregate + weight
    update), then scoring, rank-identity AUC, accuracy and log-loss."""
    parts = [_lr_feature_sql()]
    for t in range(1, _LR_STEPS + 1):
        parts.append(f""", g{t} as (
        select round(avg(y - p), 6) as g0,
               round(avg((y - p) * z1), 6) as ga,
               round(avg((y - p) * z2), 6) as gb
        from (
            select y, z1, z2,
                   1 / (1 + exp(-(a + b * z1 + c * z2))) as p
            from z, ws{t - 1}
        )
    ), ws{t} as (
        select a + g0 as a, b + ga as b, c + gb as c from ws{t - 1}, g{t}
    )""")
    parts.append(f""", scored as (
        select y, round(1 / (1 + exp(-(a + b * z1 + c * z2))), 6) as p
        from z, ws{_LR_STEPS}
    ), dist as (
        select p, count(*) as cnt, sum(y) as cnt1 from scored group by p
    ), rk as (
        select cnt, cnt1,
               sum(cnt) over (order by p
                              rows between unbounded preceding
                              and current row)
                 - cnt + (cnt + 1) / 2.0 as midrank
        from dist
    ), aucs as (
        select sum(cnt1) as n1, sum(cnt) as n_tot,
               sum(midrank * cnt1) as r1
        from rk
    ), accs as (
        select count(*) as n, sum(y) as npos,
               sum(case when (p >= 0.5) = (y = 1) then 1 else 0 end)
                   as ncorr,
               round(avg(-(y * ln(greatest(p, 1e-9))
                           + (1 - y) * ln(greatest(1 - p, 1e-9)))), 4)
                   as logloss
        from scored
    )
    select cast(accs.n as bigint) as n_docs,
           cast(npos as bigint) as n_pos,
           round(a, 6) as w_bias, round(b, 6) as w_len,
           round(c, 6) as w_llr,
           logloss as train_logloss,
           round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (n_tot - n1)), 4) as auc,
           round(ncorr / (accs.n * 1.0), 4) as accuracy
    from accs, aucs, ws{_LR_STEPS}
    """)
    return "".join(parts)


def _lr_feature_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-build subplan of `doc_domain_classifier_gd` (the part
    `localCheckpoint()` hides from the final audited plan): tokenize →
    hashed-bucket LLR weights → per-doc DSIR score → standardized
    (y, z1, z2) training relation."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("term"), 1, 6), 16, 10).cast("long")
            % _LR_BUCKETS
        ).alias("bucket"),
    )
    bc = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_t"),
    )
    w_all = Window.partitionBy()
    llr = bc.select(
        "bucket",
        F.round(
            F.log(
                ((F.col("n_t") + 1) / (F.sum("n_t").over(w_all) + float(_LR_BUCKETS)))
                / ((F.col("n_r") + 1) / (F.sum("n_r").over(w_all) + float(_LR_BUCKETS)))
            ),
            6,
        ).alias("w"),
    )
    fx = (
        tok.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("w") / F.count(F.lit(1)), 6).alias("f2"))
    )
    feat = docs.join(fx, "doc_id").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(F.log(1 + F.col("n_chars")), 6).alias("f1"),
        "f2",
    )
    st = feat.agg(
        F.avg("f1").alias("m1"),
        F.stddev_pop("f1").alias("s1"),
        F.avg("f2").alias("m2"),
        F.stddev_pop("f2").alias("s2"),
    )
    return feat.crossJoin(F.broadcast(st)).select(
        "y",
        F.round((F.col("f1") - F.col("m1")) / F.col("s1"), 6).alias("z1"),
        F.round((F.col("f2") - F.col("m2")) / F.col("s2"), 6).alias("z2"),
    )


@register_grid_plans("doc_domain_classifier_gd")
def _lr_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    z = _lr_feature_z(spark, sf_dir)
    p = 1 / (1 + F.exp(-(F.lit(0.0) + F.lit(0.0) * F.col("z1")
                         + F.lit(0.0) * F.col("z2"))))
    grad = z.agg(
        F.round(F.avg(F.col("y") - p), 6).alias("g0"),
        F.round(F.avg((F.col("y") - p) * F.col("z1")), 6).alias("ga"),
        F.round(F.avg((F.col("y") - p) * F.col("z2")), 6).alias("gb"),
    )
    # `features` is the checkpoint-hidden build; `grad_step` is the shape
    # of each per-iteration 1-row aggregate (over the uncheckpointed z so
    # the whole training lineage is visible in one audited plan)
    return {"features": z, "grad_step": grad}


@register("doc_domain_classifier_gd", _lr_oracle())
def doc_domain_classifier_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic-regression domain classifier trained IN THE ENGINE by
    {_LR_STEPS} unrolled full-batch gradient-descent steps → one row
    (n_docs, n_pos, w_bias, w_len, w_llr, train_logloss, auc, accuracy):
    the CCNet/GPT-3 quality-classifier pattern — positive class = target
    domain (lang = 'en'), features = standardized ln(1+chars) and the
    DSIR hashed-unigram LLR score — distilled into a smooth calibrated
    score, with AUC computed by the Mann–Whitney rank identity over the
    distinct-probability pre-aggregate.

    Training IS the aggregate loop: each step is one
    map-side-combinable 3-sum gradient aggregate over the checkpointed
    (y, z1, z2) feature relation; the weight state is 3 numbers. That is
    the 100 TB posture — full-batch GD over any corpus is a handful of
    scans, no per-row Python, no parameter shuffle. Parity discipline:
    features and z-scores round to 6, each gradient rounds to 6 BEFORE
    the update, so both engines walk the identical weight trajectory
    (weight updates are exact double sums of identical rounded terms);
    the per-step weight transfer through the driver is 3 floats (the
    bounded-driver-action class the BPE trainer established)."""
    z = _lr_feature_z(spark, sf_dir).coalesce(8).localCheckpoint(eager=True)
    a = b = c = 0.0
    for _ in range(_LR_STEPS):
        p = 1 / (
            1 + F.exp(-(F.lit(a) + F.lit(b) * F.col("z1") + F.lit(c) * F.col("z2")))
        )
        g = z.agg(
            F.round(F.avg(F.col("y") - p), 6).alias("g0"),
            F.round(F.avg((F.col("y") - p) * F.col("z1")), 6).alias("ga"),
            F.round(F.avg((F.col("y") - p) * F.col("z2")), 6).alias("gb"),
        ).collect()[0]
        a, b, c = a + g.g0, b + g.ga, c + g.gb
    scored = z.select(
        "y",
        F.round(
            1
            / (
                1
                + F.exp(
                    -(F.lit(a) + F.lit(b) * F.col("z1") + F.lit(c) * F.col("z2"))
                )
            ),
            6,
        ).alias("p"),
    )
    dist = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("cnt1")
    )
    w_cum = Window.partitionBy().orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = dist.select(
        "cnt",
        "cnt1",
        (
            F.sum("cnt").over(w_cum) - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("midrank"),
    )
    aucs = rk.agg(
        F.sum("cnt1").alias("n1"),
        F.sum("cnt").alias("n_tot"),
        F.sum(F.col("midrank") * F.col("cnt1")).alias("r1"),
    )
    accs = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("npos"),
        F.sum(
            F.when((F.col("p") >= 0.5) == (F.col("y") == 1), 1).otherwise(0)
        ).alias("ncorr"),
        F.round(
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-9)))
                    + (1 - F.col("y"))
                    * F.log(F.greatest(1 - F.col("p"), F.lit(1e-9)))
                )
            ),
            4,
        ).alias("logloss"),
    )
    n1, n_tot, r1 = F.col("n1"), F.col("n_tot"), F.col("r1")
    return accs.crossJoin(F.broadcast(aucs)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("npos").cast("bigint").alias("n_pos"),
        F.round(F.lit(a), 6).alias("w_bias"),
        F.round(F.lit(b), 6).alias("w_len"),
        F.round(F.lit(c), 6).alias("w_llr"),
        F.col("logloss").alias("train_logloss"),
        F.round((r1 - n1 * (n1 + 1) / 2.0) / (n1 * (n_tot - n1)), 4).alias("auc"),
        F.round(F.col("ncorr") / (F.col("n") * F.lit(1.0)), 4).alias(
            "accuracy"
        ),
    )


# --------------------------------------------------------------------------
# STL-lite: classical additive seasonal decomposition of the hourly series
# --------------------------------------------------------------------------

_STL_ORACLE = """
    with hourly as (
        select date_trunc('hour', ts) as h,
               cast(round(avg(value) * 1e6) as bigint) as vmu
        from events group by 1
    ), tr as (
        select h, vmu,
               case when count(*) over w = 25
                    then sum(vmu) over w end as tsum
        from hourly
        window w as (order by h rows between 12 preceding
                     and 12 following)
    ), de as (
        select extract(hour from h) as hod,
               25 * vmu - tsum as dmu
        from tr
    ), sraw as (
        select hod, sum(dmu) as s_num, count(dmu) as n_obs
        from de group by hod
    ), sr as (
        select hod, n_obs,
               cast(round(4.0 * s_num / n_obs) as bigint) as sr8
        from sraw
    ), season as (
        select hod, n_obs, sr8, sum(sr8) over () as c_num from sr
    )
    select cast(s.hod as bigint) as hour_of_day,
           cast(s.n_obs as bigint) as n_obs,
           round((s.sr8 - s.c_num / 24.0) / 1e8, 6) as seasonal,
           round(sum(abs(cast(round(4.0 * d.dmu - s.sr8 + s.c_num / 24.0)
                              as bigint)))
                 / (count(*) * 1.0e8), 4) as mean_abs_remainder
    from de d join season s using (hod)
    where d.dmu is not null
    group by s.hod, s.n_obs, s.sr8, s.c_num
    order by hour_of_day
"""


@register("event_hourly_stl_decompose", _STL_ORACLE)
def event_hourly_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (STL-lite) of the
    hourly mean-value series → 24 rows (hour_of_day, n_obs, seasonal,
    mean_abs_remainder): trend = 25-point centered moving average
    (defined only where the window is full), seasonal index = mean
    detrended value per hour-of-day re-centered to sum 0, remainder =
    detrended − seasonal — the decomposition behind the battery's
    seasonal-naive baseline, exposing HOW MUCH of the signal the
    daily cycle explains (mean_abs_remainder vs seasonal amplitude).

    Scale: the fact stream collapses to the |hours| pre-aggregate
    first; every window (centered MA, seasonal centering) runs on that
    O(days·24) relation, never the facts. Parity: the series quantizes
    to INTEGER MICRO-UNITS at the first aggregate and every cross-row
    sum thereafter is exact bigint arithmetic (the integer-cents
    discipline `part_revenue_abc` established) — means of already-
    rounded floats land EXACTLY on rounding boundaries (grid-aligned
    rationals), so float aggregation of rounded values is the one
    cascade shape that does flip digits across engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round(F.avg("value") * 1e6).cast("long").alias("vmu")
    )
    w_ma = Window.partitionBy().orderBy("h").rowsBetween(-12, 12)
    tr = hourly.select(
        "h",
        "vmu",
        F.when(
            F.count(F.lit(1)).over(w_ma) == 25, F.sum("vmu").over(w_ma)
        ).alias("tsum"),
    )
    de = tr.select(
        F.hour("h").alias("hod"),
        (25 * F.col("vmu") - F.col("tsum")).alias("dmu"),
    )
    sraw = de.groupBy("hod").agg(
        F.sum("dmu").alias("s_num"), F.count("dmu").alias("n_obs")
    )
    sr = sraw.select(
        "hod",
        "n_obs",
        F.round(4.0 * F.col("s_num") / F.col("n_obs")).cast("long").alias(
            "sr8"
        ),
    )
    w_all = Window.partitionBy()
    season = sr.select(
        "hod", "n_obs", "sr8", F.sum("sr8").over(w_all).alias("c_num")
    )
    rem8 = F.round(
        4.0 * F.col("dmu") - F.col("sr8") + F.col("c_num") / 24.0
    ).cast("long")
    return (
        de.filter(F.col("dmu").isNotNull())
        .join(F.broadcast(season), "hod")
        .groupBy(
            F.col("hod").cast("bigint").alias("hour_of_day"),
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.round(
                (F.col("sr8") - F.col("c_num") / 24.0) / 1e8, 6
            ).alias("seasonal"),
        )
        .agg(
            F.round(
                F.sum(F.abs(rem8)) / (F.count(F.lit(1)) * F.lit(1.0e8)), 4
            ).alias("mean_abs_remainder")
        )
        .orderBy("hour_of_day")
    )


# --------------------------------------------------------------------------
# Two-feature Mahalanobis outliers (quantity, extendedprice)
# --------------------------------------------------------------------------

_MAHAL_ORACLE = """
    with b as (
        select l_returnflag,
               l_quantity::decimal(19,6) as x,
               l_extendedprice::decimal(19,6) as y
        from lineitem
    ), s as (
        select count(*) as n,
               sum(x)::double as sx, sum(y)::double as sy,
               sum(x * x)::double as sxx, sum(x * y)::double as sxy,
               sum(y * y)::double as syy
        from b
    ), m as (
        select n, sx / n as mx, sy / n as my,
               sxx / n - (sx / n) * (sx / n) as cxx,
               sxy / n - (sx / n) * (sy / n) as cxy,
               syy / n - (sy / n) * (sy / n) as cyy
        from s
    ), d as (
        select l_returnflag,
               round(((x::double - mx) * (cyy * (x::double - mx)
                                          - cxy * (y::double - my))
                      + (y::double - my) * (cxx * (y::double - my)
                                            - cxy * (x::double - mx)))
                     / (cxx * cyy - cxy * cxy), 6) as d2
        from b, m
    )
    select l_returnflag as returnflag,
           cast(count(*) as bigint) as n_lines,
           round(avg(d2), 4) as mean_d2,
           cast(sum(case when d2 > 9.21 then 1 else 0 end) as bigint)
               as n_outliers,
           round(max(d2), 4) as max_d2
    from d group by 1 order by 1
"""


@register("lineitem_mahalanobis_outliers", _MAHAL_ORACLE)
def lineitem_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-feature Mahalanobis outlier audit over (quantity,
    extendedprice) → (returnflag, n_lines, mean_d2, n_outliers, max_d2):
    squared Mahalanobis distance from the corpus centroid under the
    closed-form 2×2 covariance inverse, thresholded at χ²₂(0.99) = 9.21
    — the MULTIVARIATE outlier gate that catches correlation-breaking
    rows (cheap-but-huge quantities) the univariate z-score/MAD entries
    pass. E[d²] = 2 for the true distribution, so mean_d2 doubles as a
    model-fit diagnostic.

    Parity: the five sufficient statistics are exact decimal sums (the
    elasticity discipline), the covariance algebra runs once on those
    exact values, and the per-row distance is row-local arithmetic
    against the broadcast 1-row stats — one fact scan + one
    map-side-combinable aggregate at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(19,6)").alias("x"),
        F.col("l_extendedprice").cast("decimal(19,6)").alias("y"),
    )
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    m = s.select(
        (sx / n).alias("mx"),
        (sy / n).alias("my"),
        (F.col("sxx") / n - (sx / n) * (sx / n)).alias("cxx"),
        (F.col("sxy") / n - (sx / n) * (sy / n)).alias("cxy"),
        (F.col("syy") / n - (sy / n) * (sy / n)).alias("cyy"),
    )
    xd = F.col("x").cast("double") - F.col("mx")
    yd = F.col("y").cast("double") - F.col("my")
    det = F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy")
    d = li.crossJoin(F.broadcast(m)).select(
        "l_returnflag",
        F.round(
            (
                xd * (F.col("cyy") * xd - F.col("cxy") * yd)
                + yd * (F.col("cxx") * yd - F.col("cxy") * xd)
            )
            / det,
            6,
        ).alias("d2"),
    )
    return (
        d.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.avg("d2"), 4).alias("mean_d2"),
            F.sum(F.when(F.col("d2") > 9.21, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.round(F.max("d2"), 4).alias("max_d2"),
        )
        .orderBy("returnflag")
    )


# --------------------------------------------------------------------------
# Markov stationary distribution of event-type transitions
# --------------------------------------------------------------------------

_MARKOV_ITERS = 8


def _markov_oracle() -> str:
    """Per-user consecutive transitions → row-normalized 5×5 matrix →
    unrolled power iteration from the uniform start."""
    parts = ["""
    with seq as (
        select event_type as cur,
               lead(event_type) over (partition by user_id
                                      order by ts, event_id) as nxt
        from events
    ), trans as (
        select cur, nxt, count(*) as cnt from seq
        where nxt is not null group by cur, nxt
    ), pm as (
        select cur, nxt,
               cnt / (sum(cnt) over (partition by cur) * 1.0) as p
        from trans
    ), types as (
        select distinct cur as t from trans
    ), v0 as (
        select t, 1.0 / (select count(*) from types) as v from types
    )"""]
    prev = "v0"
    for i in range(1, _MARKOV_ITERS + 1):
        parts.append(f""", v{i} as (
        select pm.nxt as t, round(sum(v.v * pm.p), 8) as v
        from pm join {prev} v on pm.cur = v.t group by pm.nxt
    )""")
        prev = f"v{i}"
    parts.append(f"""
    , emp as (
        select event_type, count(*) as cnt from events group by 1
    ), tot as (select sum(cnt) as n from emp)
    select v.t as event_type,
           round(v.v, 6) as stationary_prob,
           round(emp.cnt / (tot.n * 1.0), 6) as empirical_share
    from v{_MARKOV_ITERS} v
    join emp on emp.event_type = v.t, tot
    order by event_type
    """)
    return "".join(parts)


def _markov_trans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-side subplan of `event_type_markov_stationary`: per-user
    lead window → the ≤|types|² transition-count grid the driver-side
    power iteration consumes."""
    ev = load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w_u).alias("nxt"),
    )
    return (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register_grid_plans("event_type_markov_stationary")
def _markov_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {"transition_grid": _markov_trans(spark, sf_dir)}


@register("event_type_markov_stationary", _markov_oracle())
def event_type_markov_stationary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov chain →
    (event_type, stationary_prob, empirical_share): transition counts
    from consecutive events per user (the `event_type_transitions`
    grain), row-normalized to probabilities, then {_MARKOV_ITERS}
    unrolled power-iteration steps from the uniform start — the
    long-run visit mix the chain converges to, against the raw
    empirical share (they differ when users ENTER the stream
    non-stationarily, e.g. signup-first).

    Scale: the only fact-sized work is the per-user lead window (the
    established sessionization cost); everything after runs on the
    |types|² matrix — which is O(k²) DRIVER state by house discipline
    (round-10 compression, the mixture-reweight precedent: the first
    cut ran the 8 power steps as distributed joins over a ≤25-row
    relation, 21 exchanges of scheduling overhead for arithmetic that
    has no business on the cluster). Transition counts collect once as
    exact integers; probabilities divide on the driver with the same
    double op the engines used; each iterate rounds to 8 half-up on
    the shortest decimal repr (F.round semantics), pinning the
    trajectory."""
    from decimal import ROUND_HALF_UP, Decimal

    def _r8(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-8), rounding=ROUND_HALF_UP
            )
        )

    ev = load_table(spark, sf_dir, "events")
    rows = _markov_trans(spark, sf_dir).collect()  # ≤ |types|² integer counts — bounded
    rowsum: dict[str, int] = {}
    for r in rows:
        rowsum[r.cur] = rowsum.get(r.cur, 0) + r.cnt
    pm = sorted(
        (r.nxt, r.cur, r.cnt / (rowsum[r.cur] * 1.0)) for r in rows
    )
    v = {t: 1.0 / len(rowsum) for t in rowsum}
    for _ in range(_MARKOV_ITERS):
        acc: dict[str, float] = {}
        for nxt, cur, p in pm:  # deterministic (nxt, cur) fold order
            if cur in v:
                acc[nxt] = acc.get(nxt, 0.0) + v[cur] * p
        v = {t: _r8(s) for t, s in acc.items()}
    v_df = spark.createDataFrame(
        sorted(v.items()), "event_type string, v double"
    )
    emp = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w_all = Window.partitionBy()
    emp_share = emp.select(
        "event_type",
        F.round(
            F.col("cnt") / (F.sum("cnt").over(w_all) * F.lit(1.0)), 6
        ).alias("empirical_share"),
    )
    return (
        emp_share.join(F.broadcast(v_df), "event_type")
        .select(
            "event_type",
            F.round("v", 6).alias("stationary_prob"),
            "empirical_share",
        )
        .orderBy("event_type")
    )
