"""Round-8d battery additions: feature-drift and scorecard metrics plus
the streaming CUSUM twin —

- PSI (population stability index) between the first and second half of
  the event stream over reference-decile bins — the standard "did this
  feature's distribution move" production gate;
- KS scorecard separation (max |cdf_good − cdf_bad|) of a sigmoid score
  — the credit-risk/classifier discrimination metric beside AUC and the
  calibration report, computed with exact integer cross-multiplication;
- a deterministic domain-interleave mixture schedule — the actual
  batch-order artifact a training run consumes (round-robin across
  languages, hash-shuffled within each);
- `event_cusum_stream_ledger`: foreachBatch maintains mergeable
  integer-micro (type, day) partials across chronological microbatches,
  then the retrospective CUSUM runs on the maintained state — the
  stream twin of `event_value_cusum_changepoint` with EXACT merge
  parity (integer partials commute).

All oracle-paired; registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# PSI feature drift over reference-decile bins
# --------------------------------------------------------------------------

_PSI_PROBS = [i / 10.0 for i in range(1, 10)]

_PSI_ORACLE = f"""
    with ev as (
        select cast(ts as date) as day, value from events
    ), span as (
        select min(day) as lo, max(day) as hi from ev
    ), lab as (
        select value,
               case when date_diff('day', lo, day) * 2
                         < date_diff('day', lo, hi)
                    then 'ref' else 'cur' end as period
        from ev, span
    ), bounds as (
        select quantile_cont(value, {_PSI_PROBS}) as b
        from lab where period = 'ref'
    ), binned as (
        select period,
               1 + len(list_filter(b, x -> value > x)) as bin
        from lab, bounds
    ), cnt as (
        select bin,
               sum(case when period = 'ref' then 1 else 0 end) as n_ref,
               sum(case when period = 'cur' then 1 else 0 end) as n_cur
        from binned group by bin
    ), grid as (
        select gs.bin, coalesce(cnt.n_ref, 0) as n_ref,
               coalesce(cnt.n_cur, 0) as n_cur
        from (select unnest(generate_series(1, 10)) as bin) gs
        left join cnt on cnt.bin = gs.bin
    ), tot as (
        select sum(n_ref) as tr, sum(n_cur) as tc from grid
    )
    select cast(bin as bigint) as bin,
           cast(n_ref as bigint) as n_ref, cast(n_cur as bigint) as n_cur,
           round((n_ref + 1) / (tr + 10.0), 6) as p_ref,
           round((n_cur + 1) / (tc + 10.0), 6) as p_cur,
           round(((n_cur + 1) / (tc + 10.0) - (n_ref + 1) / (tr + 10.0))
                 * ln(((n_cur + 1) / (tc + 10.0))
                      / ((n_ref + 1) / (tr + 10.0))), 6) as psi_term
    from grid, tot
    order by bin
"""


@register("event_value_psi_drift", _PSI_ORACLE)
def event_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the event value between the first
    and second half of the observed window: bins are EXACT reference
    deciles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
    bit-compatible — the `order_price_deciles` device), both periods'
    bin shares add-one smooth over the fixed 10-bin spine (an empty
    current bin must contribute, not vanish), psi_term =
    (p_cur−p_ref)·ln(p_cur/p_ref); Σ psi_term is the headline PSI
    (<0.1 stable / >0.25 action — the standard gate). The period split
    is integer date arithmetic (2·offset < span), engine-exact. Plan:
    one scan + three 1-row broadcasts (span, bounds, totals) + a
    10-row spine join — flat at any scale."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    span = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    lab = ev.crossJoin(F.broadcast(span)).select(
        "value",
        F.when(
            F.datediff(F.col("day"), F.col("lo")) * 2
            < F.datediff(F.col("hi"), F.col("lo")),
            "ref",
        )
        .otherwise("cur")
        .alias("period"),
    )
    probs = ", ".join(str(p) for p in _PSI_PROBS)
    bounds = lab.filter(F.col("period") == "ref").agg(
        F.expr(f"percentile(value, array({probs}))").alias("b")
    )
    binned = lab.crossJoin(F.broadcast(bounds)).select(
        "period",
        (
            F.size(F.filter(F.col("b"), lambda x: F.col("value") > x)) + 1
        ).alias("bin"),
    )
    cnt = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias(
            "n_ref"
        ),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias(
            "n_cur"
        ),
    )
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
    grid = (
        spine.join(cnt, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    # totals ride a window over the bounded 10-row grid (round-10
    # compression: one fewer 1-row crossJoin/BNLJ and aggregate branch)
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    p_ref = (F.col("n_ref") + 1) / (F.sum("n_ref").over(w_all) + 10.0)
    p_cur = (F.col("n_cur") + 1) / (F.sum("n_cur").over(w_all) + 10.0)
    return (
        grid
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias(
                "psi_term"
            ),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# KS scorecard separation (exact integer cross-multiplication)
# --------------------------------------------------------------------------

_KS_ORACLE = """
    with s as (
        select round(1 / (1 + exp(-((value - 100.0) / 50.0))), 9) as sc,
               case when event_type = 'purchase' then 1 else 0 end as g
        from events
    ), d as (
        select sc, sum(g) as cg, sum(1 - g) as cb from s group by sc
    ), c as (
        select sc,
               sum(cg) over (order by sc
                   rows between unbounded preceding and current row) as cgt,
               sum(cb) over (order by sc
                   rows between unbounded preceding and current row) as cbt,
               sum(cg) over () as ng, sum(cb) over () as nb
        from d
    )
    select cast(ng as bigint) as n_good, cast(nb as bigint) as n_bad,
           round(abs(cgt * nb - cbt * ng) / (1.0 * ng * nb), 6) as ks,
           round(sc, 6) as at_score
    from c
    qualify row_number() over (order by abs(cgt * nb - cbt * ng) desc, sc)
            = 1
"""


@register("event_score_ks_separation", _KS_ORACLE)
def event_score_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov scorecard separation: max |CDF_good −
    CDF_bad| of the sigmoid purchase score — the discrimination metric
    between AUC (`doc_domain_classifier_gd`'s rank identity) and the
    reliability report (`event_score_calibration`); a scorecard with
    KS < 0.2 doesn't separate. Exact parity by integer
    cross-multiplication over the distinct-score pre-aggregate
    (|CG·N_b − CB·N_g| is a bigint — no per-row float CDFs), the
    `signup_purchase_latency_quantiles` discipline; argmax ties break
    on the smaller score. The score rounds to 9 dp BEFORE the groupBy
    (in both engines) so the distinct-score grain never depends on
    JVM Math.exp and libm exp agreeing to the last ulp. One scan →
    distinct-score grain → three windows on that bounded table."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        F.round(1 / (1 + F.exp(-((F.col("value") - 100.0) / 50.0))), 9).alias("sc"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g"),
    )
    d = s.groupBy("sc").agg(
        F.sum("g").alias("cg"), F.sum(1 - F.col("g")).alias("cb")
    )
    # range-partitioned running counts (round-10: the 9dp-score grid
    # grows with the data; the global Window.orderBy was a one-task sort
    # at 100x) - identity on the exact bigint counts, oracle unchanged
    # round-11: probe-reuse checkpoint (measured 0.94/0.87 -> 0.87/0.82 s
    # at sf0.1; removes a redundant fact scan at scale)
    c = ranged_cumulative(
        d, "sc", ["cg", "cb"], with_totals=True, materialize_input=True
    ).select(
        "sc",
        F.col("cg_cum").alias("cgt"),
        F.col("cb_cum").alias("cbt"),
        F.col("cg_tot").alias("ng"),
        F.col("cb_tot").alias("nb"),
    )
    dnum = F.abs(F.col("cgt") * F.col("nb") - F.col("cbt") * F.col("ng"))
    ranked = c.select(
        "sc",
        "ng",
        "nb",
        dnum.alias("dnum"),
        F.row_number()
        .over(Window.orderBy(dnum.desc(), F.col("sc").asc()))
        .alias("__rn"),
    )
    return ranked.filter(F.col("__rn") == 1).select(
        F.col("ng").cast("bigint").alias("n_good"),
        F.col("nb").cast("bigint").alias("n_bad"),
        F.round(
            F.col("dnum") / (1.0 * F.col("ng") * F.col("nb")), 6
        ).alias("ks"),
        F.round("sc", 6).alias("at_score"),
    )


# --------------------------------------------------------------------------
# deterministic domain-interleave mixture schedule
# --------------------------------------------------------------------------

_MIX_POSITIONS = 120

_MIX_ORACLE = f"""
    with r as (
        select doc_id, lang,
               row_number() over (partition by lang
                   order by md5('mix-' || doc_id), doc_id) as rn
        from documents
    ), sched as (
        select doc_id, lang,
               row_number() over (order by rn, lang, doc_id) as position
        from r
    )
    select cast(position as bigint) as position, doc_id, lang
    from sched
    where position <= {_MIX_POSITIONS}
    order by position
"""


@register("doc_mixture_schedule", _MIX_ORACLE)
def doc_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-order artifact a training run actually consumes: a
    deterministic round-robin interleave across languages (domains),
    hash-shuffled within each — position k cycles through every lang's
    k-th hash-ranked document, so any prefix of the schedule carries a
    near-uniform domain mix (the online counterpart of the static
    mixture-share entries) and reruns reproduce it exactly (md5 rank,
    doc_id tiebreak — no RNG state). First {n} positions returned; the
    full schedule is the same two windows at corpus scale (rank within
    lang shuffles |lang| rows per partition, the global interleave
    orders on (rn, lang) — never a value sort of the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    w_lang = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("mix-"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    r = docs.select(
        "doc_id", "lang", F.row_number().over(w_lang).alias("rn")
    )
    sched = r.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(Window.orderBy("rn", "lang", "doc_id"))
        .alias("position"),
    )
    return (
        sched.filter(F.col("position") <= _MIX_POSITIONS)
        .select(
            F.col("position").cast("bigint").alias("position"),
            "doc_id",
            "lang",
        )
        .orderBy("position")
    )


doc_mixture_schedule.__doc__ = doc_mixture_schedule.__doc__.format(
    n=_MIX_POSITIONS
)


# --------------------------------------------------------------------------
# streaming CUSUM ledger: mergeable integer-micro partials + final CUSUM
# --------------------------------------------------------------------------

_SCUSUM_ORACLE = """
    with s as (
        select event_type, cast(ts as date) as day,
               round(sum(cast(round(value * 1000000) as bigint))
                     / 1000000.0 / count(*), 6) as x
        from events group by 1, 2
    ), st as (
        select event_type, day, x,
               round(avg(x) over (partition by event_type), 6) as xbar,
               stddev_pop(x) over (partition by event_type) as sd,
               count(*) over (partition by event_type) as n
        from s
    ), cum as (
        select event_type, day, n, sd,
               sum(x - xbar) over (partition by event_type order by day
                   rows between unbounded preceding and current row) as s2
        from st
    )
    select event_type, cast(n as bigint) as n_points,
           strftime(day, '%Y-%m-%d') as change_day,
           round(abs(s2), 6) as cusum_peak,
           round(abs(s2) / (sd * sqrt(n)), 4) as cusum_z
    from cum
    qualify row_number() over (partition by event_type
                               order by abs(s2) desc, day) = 1
    order by event_type
"""


@register("event_cusum_stream_ledger", _SCUSUM_ORACLE)
def event_cusum_stream_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `event_value_cusum_changepoint`: events arrive
    in 3 chronological microbatches and ``foreachBatch`` maintains the
    (type, day) state as INTEGER-MICRO partials (Σ round(value·10⁶) as
    bigint + count) — exact under any merge order, so the maintained
    state equals a from-scratch aggregate bit-for-bit (the
    `event_value_stats_merged` integer-unit discipline). The
    retrospective CUSUM then runs over the final state exactly as the
    batch entry does; the oracle restates the whole thing with the same
    micro-exact daily means. State is (types × days) rows — the bounded
    shape that runs forever; no per-event state, no watermark needed
    for an append-only daily series. Replay machinery is the shared
    `streaming.ledger` harness (extracted round 9 — it also fixes a
    latent schema bug: the stream schema must be the WRITTEN waves',
    not the physical source parquet's, or the int64-nanos timestamp
    generation the loader normalizes would break the replay)."""
    from flight_radar_pipeline_spark.operators.temporal import (
        cusum_changepoint,
    )
    from flight_radar_pipeline_spark.streaming.ledger import (
        chronological_thirds,
        fold_chronological_waves,
    )

    ev = load_table(spark, sf_dir, "events")
    waves, _mid = chronological_thirds(ev)

    def increment(batch: DataFrame) -> DataFrame:
        return batch.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(
            F.sum(
                F.round(F.col("value") * 1_000_000).cast("bigint")
            ).alias("sum_micros"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )

    def merge(old: DataFrame, inc: DataFrame) -> DataFrame:
        return (
            old.unionByName(inc)
            .groupBy("event_type", "day")
            .agg(
                F.sum("sum_micros").alias("sum_micros"),
                F.sum("n").alias("n"),
            )
        )

    state = fold_chronological_waves(
        spark, waves, increment, merge, prefix="cusum_stream_"
    )
    series = state.select(
        "event_type",
        "day",
        F.round(
            F.col("sum_micros") / F.lit(1_000_000.0) / F.col("n"), 6
        ).alias("x"),
    )
    out = cusum_changepoint(series, "event_type", "day", "x")
    return out.select(
        F.col("group").alias("event_type"),
        "n_points",
        F.date_format("change_t", "yyyy-MM-dd").alias("change_day"),
        "cusum_peak",
        "cusum_z",
    ).orderBy("event_type")
