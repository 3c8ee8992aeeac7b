"""Round-7c battery additions: per-group closed-form OLS (discount
elasticity), DAU growth accounting, Flesch reading-ease corpus scoring,
Benjamini–Hochberg FDR over a cell-mean test family, split-conformal
prediction intervals, Soundex phonetic blocking for record linkage, and
HITS hubs/authorities on the customer–supplier transaction graph.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently. Registered into the shared REGISTRY on import
(see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.text import soundex_code
from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash
from flight_radar_pipeline_spark.operators.graph import hits_scores
from flight_radar_pipeline_spark.plans.battery import register, register_grid_plans
from flight_radar_pipeline_spark.plans.battery_prep import _unit_hash_sql
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# Per-brand discount elasticity: closed-form OLS slope + R²
# --------------------------------------------------------------------------

_ELASTICITY_ORACLE = """
    with j as (
        select p_brand,
               l_discount::decimal(14,6) as x,
               l_quantity::decimal(14,6) as y
        from lineitem join part on l_partkey = p_partkey
    ), g as (
        select p_brand as brand, count(*) as n,
               sum(x)::double as sx, sum(y)::double as sy,
               sum(x * x)::double as sxx, sum(x * y)::double as sxy,
               sum(y * y)::double as syy
        from j group by 1
    )
    select brand, cast(n as bigint) as n_lines,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) as slope,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) as r2
    from g order by brand
"""


@register("brand_discount_elasticity", _ELASTICITY_ORACLE)
def brand_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of quantity on discount → (brand, n_lines, slope,
    r2): the grouped closed-form regression — elasticity of demand per
    product family, slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) with R² from
    the same five sums. Complements the GLOBAL regressions already in
    the battery (Theil–Sen, Zipf OLS) with the per-group shape.

    Parity-by-construction: x and y cast to decimal(14,6) BEFORE
    summing, so all five sufficient statistics are exact decimal
    arithmetic on both engines (no float association-order drift); the
    slope/R² arithmetic then runs on those exact values in double.
    Scale: one broadcast dim join + one map-side-combinable aggregate to
    |brands| rows; the regression itself never sees a fact row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_discount").cast("decimal(14,6)").alias("x"),
        F.col("l_quantity").cast("decimal(14,6)").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    g = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    return g.select(
        "brand",
        n.cast("bigint").alias("n_lines"),
        F.round(cov_n / varx_n, 6).alias("slope"),
        F.round(cov_n * cov_n / (varx_n * vary_n), 6).alias("r2"),
    ).orderBy("brand")


# --------------------------------------------------------------------------
# DAU growth accounting: new / retained / resurrected / churned
# --------------------------------------------------------------------------

_GROWTH_ORACLE = """
    with ua as (
        select distinct user_id, cast(ts as date) as day from events
    ), lagged as (
        select user_id, day,
               lag(day) over (partition by user_id order by day) as prev_day
        from ua
    ), daily as (
        select day, count(*) as n_active,
               sum(case when prev_day is null then 1 else 0 end) as n_new,
               sum(case when prev_day = day - 1 then 1 else 0 end)
                   as n_retained,
               sum(case when prev_day is not null and prev_day < day - 1
                        then 1 else 0 end) as n_resurrected
        from lagged group by day
    )
    select strftime(day, '%Y-%m-%d') as day,
           cast(n_active as bigint) as n_active,
           cast(n_new as bigint) as n_new,
           cast(n_retained as bigint) as n_retained,
           cast(n_resurrected as bigint) as n_resurrected,
           cast(coalesce(lag(n_active) over (order by day), 0) - n_retained
                as bigint) as n_churned
    from daily order by 1
"""


@register("user_growth_accounting", _GROWTH_ORACLE)
def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting → (day, n_active, n_new, n_retained,
    n_resurrected, n_churned): every active user-day classified by the
    user's previous active day — first ever (new), yesterday (retained),
    earlier (resurrected) — with churn as yesterday's actives minus
    today's retained: the additive identity
    active(d) = new + retained + resurrected and
    churned(d) = active(d−1) − retained(d) that growth dashboards are
    built on. All-integer arithmetic: exact parity by construction.

    Scale: the fact stream collapses to the distinct (user, day) grain
    first (one shuffle, map-side combinable); the per-user lag window
    runs on that bounded relation, and the day-over-day window runs on
    |days| rows. No fact-sized window anywhere."""
    ev = load_table(spark, sf_dir, "events")
    ua = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w_u = Window.partitionBy("user_id").orderBy("day")
    lagged = ua.withColumn("prev_day", F.lag("day").over(w_u))
    daily = lagged.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("prev_day").isNull(), 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(
            F.when(F.col("prev_day") == F.date_sub("day", 1), 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_day").isNotNull()
                & (F.col("prev_day") < F.date_sub("day", 1)),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    w_d = Window.partitionBy().orderBy("day")
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_new").cast("bigint").alias("n_new"),
        F.col("n_retained").cast("bigint").alias("n_retained"),
        F.col("n_resurrected").cast("bigint").alias("n_resurrected"),
        (
            F.coalesce(F.lag("n_active").over(w_d), F.lit(0))
            - F.col("n_retained")
        )
        .cast("bigint")
        .alias("n_churned"),
    ).orderBy("day")


# --------------------------------------------------------------------------
# Flesch reading-ease corpus scoring
# --------------------------------------------------------------------------

_READABILITY_ORACLE = r"""
    with d as (
        select lang,
               len(regexp_split_to_array(trim(text), '\s+')) as words,
               greatest(1, len(regexp_extract_all(text, '[.!?]+'))) as sents,
               len(regexp_extract_all(lower(text), '[aeiouy]+')) as syls
        from documents
    ), f as (
        select lang,
               round(words / (sents * 1.0), 6) as wps,
               round(syls / (words * 1.0), 6) as spw,
               round(206.835 - 1.015 * (words / (sents * 1.0))
                     - 84.6 * (syls / (words * 1.0)), 6) as fre
        from d
    )
    select lang, cast(count(*) as bigint) as n_docs,
           round(avg(wps), 4) as avg_words_per_sentence,
           round(avg(spw), 4) as avg_syllables_per_word,
           round(avg(fre), 4) as avg_reading_ease,
           cast(sum(case when fre >= 60 then 1 else 0 end) as bigint)
               as n_easy
    from f group by lang order by lang
"""


@register("doc_readability", _READABILITY_ORACLE)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language → (lang, n_docs,
    avg_words_per_sentence, avg_syllables_per_word, avg_reading_ease,
    n_easy): FRE = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with syllables approximated by vowel-group
    count ([aeiouy]+ runs) and sentences by terminal-punctuation runs —
    the corpus-quality readability gate (n_easy counts docs at FRE ≥ 60,
    the 'plain English' band). The bulk vowel-group heuristic skips the
    per-word min-1-syllable clamp; documented, and identical on both
    engines. Pure column expressions at scan speed; per-doc ratios round
    to 6 before the per-language means round to 4, pinning
    association-order drift. One aggregate shuffle to |langs| rows."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0))
    )
    syls = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    )
    wps_raw = words / (sents * F.lit(1.0))
    spw_raw = syls / (words * F.lit(1.0))
    f = docs.select(
        "lang",
        F.round(wps_raw, 6).alias("wps"),
        F.round(spw_raw, 6).alias("spw"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps_raw - F.lit(84.6) * spw_raw, 6
        ).alias("fre"),
    )
    return (
        f.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("wps"), 4).alias("avg_words_per_sentence"),
            F.round(F.avg("spw"), 4).alias("avg_syllables_per_word"),
            F.round(F.avg("fre"), 4).alias("avg_reading_ease"),
            F.sum(F.when(F.col("fre") >= 60, 1).otherwise(0))
            .cast("bigint")
            .alias("n_easy"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Benjamini–Hochberg FDR over (type, hour) cell-mean tests
# --------------------------------------------------------------------------

_BH_ORACLE = """
    with t as (
        select event_type, avg(value) as mean_t, var_pop(value) as var_t
        from events group by 1
    ), c as (
        select event_type, extract(hour from ts) as hour,
               count(*) as n_c, avg(value) as mean_c
        from events group by 1, 2
    ), z as (
        select c.event_type, c.hour,
               round((mean_c - mean_t) / sqrt(var_t / n_c), 6) as z
        from c join t using (event_type)
    ), p as (
        select event_type, hour, z,
               round(2.0 * (1.0 - 1.0 / (1.0 + exp(-1.702 * abs(z)))), 8) as p
        from z
    ), ranked as (
        select *, row_number() over (order by p, event_type, hour) as r,
               count(*) over () as m
        from p
    ), kk as (
        select *, max(case when p <= (0.05 * r) / m then r end) over () as k
        from ranked
    )
    select event_type, cast(count(*) as bigint) as n_tests,
           cast(sum(case when r <= k then 1 else 0 end) as bigint)
               as n_rej_bh,
           cast(sum(case when p <= 0.05 then 1 else 0 end) as bigint)
               as n_rej_raw,
           round(min(p), 8) as min_p
    from kk group by event_type order by event_type
"""


@register("event_type_bh_fdr", _BH_ORACLE)
def event_type_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over the (type, hour) cell-mean
    test family → (event_type, n_tests, n_rej_bh, n_rej_raw, min_p):
    each of the |types|·24 cells tests its mean against the type's
    global mean (z on the type's population variance), p-values via the
    logistic approximation of the normal CDF (Φ(x) ≈ 1/(1+e^(−1.702x)),
    identical closed form on both engines), then the step-up procedure —
    reject the k smallest p where k = max{r : p₍ᵣ₎ ≤ α·r/m} — the
    multiple-testing discipline the battery's per-test entries (chi²,
    rank tests, CUPED) feed into. n_rej_raw counts naive α=0.05
    rejections for contrast.

    Scale: two map-side-combinable aggregates to |types| and
    |types|·24 rows; ranking windows run on the m-row test table, never
    the facts. z rounds to 6 and p to 8 before any rank or comparison,
    with (type, hour) tiebreaks — the selection path is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy("event_type").agg(
        F.avg("value").alias("mean_t"), F.var_pop("value").alias("var_t")
    )
    c = ev.groupBy("event_type", F.hour("ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_c"), F.avg("value").alias("mean_c")
    )
    z = c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "hour",
        F.round(
            (F.col("mean_c") - F.col("mean_t"))
            / F.sqrt(F.col("var_t") / F.col("n_c")),
            6,
        ).alias("z"),
    )
    p = z.select(
        "event_type",
        "hour",
        F.round(
            2.0 * (1.0 - 1.0 / (1.0 + F.exp(-1.702 * F.abs(F.col("z"))))), 8
        ).alias("p"),
    )
    w_rank = Window.partitionBy().orderBy("p", "event_type", "hour")
    w_all = Window.partitionBy()
    ranked = p.select(
        "event_type",
        "p",
        F.row_number().over(w_rank).alias("r"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    kk = ranked.withColumn(
        "k",
        F.max(
            F.when(
                F.col("p") <= (F.lit(0.05) * F.col("r")) / F.col("m"),
                F.col("r"),
            )
        ).over(w_all),
    )
    return (
        kk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tests"),
            F.sum(F.when(F.col("r") <= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_rej_bh"),
            F.sum(F.when(F.col("p") <= 0.05, 1).otherwise(0))
            .cast("bigint")
            .alias("n_rej_raw"),
            F.round(F.min("p"), 8).alias("min_p"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Split-conformal prediction intervals with holdout coverage
# --------------------------------------------------------------------------

_CONFORMAL_ORACLE = f"""
    with e as (
        select event_type, value,
               {_unit_hash_sql("event_id::varchar", "conf")} as u
        from events
    ), mu as (
        select event_type, round(avg(value), 6) as mu
        from e where u < 0.5 group by 1
    ), cal as (
        select e.event_type, round(abs(value - mu), 6) as r
        from e join mu using (event_type) where u >= 0.5 and u < 0.75
    ), nk as (
        select event_type, count(*) as n_cal,
               least(floor((9 * (count(*) + 1) + 9) / 10.0),
                     count(*)) as k
        from cal group by 1
    ), dist as (
        select event_type, r, count(*) as cnt from cal group by 1, 2
    ), cum as (
        select event_type, r,
               sum(cnt) over (partition by event_type order by r
                              rows between unbounded preceding
                              and current row) as cum
        from dist
    ), q as (
        select c.event_type, min(r) as qhat
        from cum c join nk using (event_type)
        where cum >= k group by c.event_type
    ), ev as (
        select e.event_type,
               case when round(abs(value - mu), 6) <= qhat
                    then 1 else 0 end as cov
        from e join mu using (event_type) join q using (event_type)
        where u >= 0.75
    ), agg as (
        select event_type, cast(count(*) as bigint) as n_eval,
               round(sum(cov) / (count(*) * 1.0), 4) as coverage
        from ev group by 1
    )
    select agg.event_type, cast(n_cal as bigint) as n_calib, qhat,
           n_eval, coverage
    from agg join nk using (event_type) join q using (event_type)
    order by event_type
"""


def _conformal_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-side subplan of `event_value_conformal`: hash split →
    per-type train means → (type, rounded-residual) count grid →
    cumulative/total windows. Factored out so the entry can materialize
    it once AND the hidden subplan stays grid-audited (round-14)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    e = ev.select(
        "event_type", "value", unit_hash("event_id", "conf").alias("u")
    )
    mu = (
        e.filter(F.col("u") < 0.5)
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("mu"))
    )
    grid = (
        e.filter(F.col("u") >= 0.5)
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            F.round(F.abs(F.col("value") - F.col("mu")), 6).alias("r"),
            (F.col("u") < 0.75).alias("is_cal"),
        )
        .groupBy("event_type", "r")
        .agg(
            F.sum(F.when(F.col("is_cal"), 1).otherwise(0)).alias("c_cal"),
            F.sum(F.when(F.col("is_cal"), 0).otherwise(1)).alias("c_eval"),
        )
    )
    w_nat = Window.partitionBy("event_type")
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "event_type",
        "r",
        "c_cal",
        "c_eval",
        F.sum("c_cal").over(w_cum).alias("cum_cal"),
        F.sum("c_cal").over(w_nat).alias("n_cal"),
    )


@register_grid_plans("event_value_conformal")
def _conformal_grid_plans(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    return {"residual_grid": _conformal_cum(spark, sf_dir)}


@register("event_value_conformal", _CONFORMAL_ORACLE)
def event_value_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per event type →
    (event_type, n_calib, qhat, n_eval, coverage): deterministic-hash
    three-way split (50% train / 25% calibration / 25% eval), point
    predictor = per-type train mean, nonconformity = |value − μ|, and
    qhat the ⌈0.9(n+1)⌉-th smallest calibration residual — the
    distribution-free interval μ ± qhat whose eval coverage must land
    near the 90% guarantee regardless of the value distribution. The
    finite-sample rank uses exact integer arithmetic
    (⌈9(n+1)/10⌉ = ⌊(9(n+1)+9)/10⌋) on both engines.

    Scale (round-10 compression — the haar/kadane precedent): the fact
    is scanned exactly TWICE — once for the train means, once to build
    the (type, residual, split) COUNT GRID for calibration and eval
    rows together; everything downstream (n_cal/k, the rank walk to
    qhat, eval coverage) is windows and broadcast joins over the
    materialized grid. Round-14: the grid is CHECKPOINTED once — the
    round-10 compression assumed ReusedExchange would compute it once
    under both consumers (qhat side + coverage side), but the executed
    plan re-derived the whole scan→hash→join→aggregate→window chain
    under the qhat broadcast (a third fact pass with a second md5 per
    row; plans/r14/event_value_conformal_{before,after}.txt). The grid
    is the bounded (type, rounded-residual) relation — the mid-plan
    bounded-checkpoint class — and the hidden subplan is grid-audited
    (`[grid:residual_grid]`). Residuals round to 6 on both sides of the
    comparison, pinning parity; all grid arithmetic is exact
    integers."""
    cum = _conformal_cum(spark, sf_dir).localCheckpoint(eager=True)
    k = F.least(
        F.floor((9 * (F.col("n_cal") + 1) + 9) / 10.0), F.col("n_cal")
    )
    q = (
        cum.filter(F.col("cum_cal") >= k)
        .groupBy("event_type")
        .agg(F.min("r").alias("qhat"))
    )
    return (
        cum.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_cal").cast("bigint").alias("n_calib"),
            F.max("qhat").alias("qhat"),
            F.sum("c_eval").cast("bigint").alias("n_eval"),
            F.round(
                F.sum(
                    F.when(F.col("r") <= F.col("qhat"), F.col("c_eval"))
                    .otherwise(0)
                )
                / (F.sum("c_eval") * F.lit(1.0)),
                4,
            ).alias("coverage"),
        )
        # the pre-compression form's inner joins dropped types with no
        # calibration or no eval rows — keep that contract exactly
        .filter((F.col("n_calib") > 0) & (F.col("n_eval") > 0))
        .select(
            "event_type",
            "n_calib",
            "qhat",
            "n_eval",
            "coverage",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Soundex phonetic blocking over part-name vocabulary
# --------------------------------------------------------------------------


def _soundex_sql(expr: str) -> str:
    """SQL twin of functions.text.soundex_code (simplified American
    Soundex, no H/W elision); run collapsing is RE2-safe (one d+ replace
    per digit class, no backreferences)."""
    s = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    coded = (
        f"translate({s}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        f" '01230120022455012623010202')"
    )
    for d in "0123456":
        coded = f"regexp_replace({coded}, '{d}+', '{d}', 'g')"
    rest = f"replace(substr({coded}, 2), '0', '')"
    return (
        f"case when length({s}) > 0 then substr({s}, 1, 1)"
        f" || rpad(substr({rest}, 1, 3), 3, '0') end"
    )


_SOUNDEX_ORACLE = f"""
    with tok as (
        select lower(unnest(string_split(p_name, ' '))) as word from part
    ), w as (
        select word, count(*) as n_parts from tok group by 1
    ), coded as (
        select word, n_parts, {_soundex_sql("word")} as code from w
    )
    select a.code, a.word as word_1, b.word as word_2,
           cast(levenshtein(a.word, b.word) as bigint) as lev,
           cast(a.n_parts as bigint) as n_occ_1,
           cast(b.n_parts as bigint) as n_occ_2
    from coded a join coded b on a.code = b.code and a.word < b.word
    where levenshtein(a.word, b.word) <= 2
    order by a.code, a.word, b.word
"""


@register("part_soundex_blocks", _SOUNDEX_ORACLE)
def part_soundex_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic blocking → (code, word_1, word_2, lev,
    n_occ_1, n_occ_2): part-name lead words that SOUND alike land in
    the same 4-char Soundex block; within-block pairs verify with edit
    distance ≤ 2 — the third blocking strategy in the linkage family
    (alongside the first-token equality of `part_name_fuzzy_pairs` and
    the key-sort of `part_sorted_neighborhood_pairs`), the one that
    catches spelling variants sharing no prefix (e.g. transposed
    vowels — red/rod land in R300 together). The pair join runs on the
    DISTINCT-WORD vocabulary grain over ALL name words — the
    prefix-filter discipline — so cost is |vocab in block|², not
    |parts|²; word multiplicities ride along as counts. Soundex itself
    is pure column expressions (`functions.text.soundex_code`), with the
    algorithm pinned by hand-case unit tests (`tests/test_r7c_ops.py`)."""
    part = load_table(spark, sf_dir, "part")
    w = part.select(
        F.explode(F.split(F.lower(F.col("p_name")), " ")).alias("word")
    ).groupBy("word").agg(F.count(F.lit(1)).alias("n_parts"))
    coded = w.select("word", "n_parts", soundex_code("word").alias("code"))
    a = coded.select(
        F.col("code"),
        F.col("word").alias("word_1"),
        F.col("n_parts").alias("np1"),
    )
    b = coded.select(
        F.col("code"),
        F.col("word").alias("word_2"),
        F.col("n_parts").alias("np2"),
    )
    return (
        a.join(b, "code")
        .filter(F.col("word_1") < F.col("word_2"))
        .filter(F.levenshtein("word_1", "word_2") <= 2)
        .select(
            "code",
            "word_1",
            "word_2",
            F.levenshtein("word_1", "word_2").cast("bigint").alias("lev"),
            F.col("np1").cast("bigint").alias("n_occ_1"),
            F.col("np2").cast("bigint").alias("n_occ_2"),
        )
        .orderBy("code", "word_1", "word_2")
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities on the customer→supplier transaction graph
# --------------------------------------------------------------------------


def _hits_oracle() -> str:
    """Unrolled 3-iteration HITS as a CTE chain: exact bigint path
    counts per iteration (see operators.graph.hits_scores), one L1
    normalization at the end."""
    parts = [
        """
    with edges as (
        select distinct 'c' || o_custkey as src, 's' || l_suppkey as dst
        from orders join lineitem on l_orderkey = o_orderkey
    ), h0 as (
        select distinct src as node, cast(1 as bigint) as s from edges
    )"""
    ]
    prev = "h0"
    for i in (1, 2, 3):
        parts.append(f""", a{i} as (
        select dst as node, cast(sum(h.s) as bigint) as s
        from edges join {prev} h on edges.src = h.node group by dst
    ), h{i} as (
        select src as node, cast(sum(a.s) as bigint) as s
        from edges join a{i} a on edges.dst = a.node group by src
    )""")
        prev = f"h{i}"
    parts.append("""
    , scored as (
        select 'authority' as role, node, s from a3
        union all
        select 'hub' as role, node, s from h3
    ), normed as (
        select role, node, s as paths,
               round(s / (sum(s) over (partition by role) * 1.0), 8)
                   as score,
               row_number() over (partition by role
                                  order by s desc, node) as rn
        from scored
    )
    select role, node, cast(paths as bigint) as paths, score,
           cast(rn as bigint) as rank
    from normed where rn <= 10 order by role, rank
    """)
    return "".join(parts)


@register("entity_hits_scores", _hits_oracle())
def entity_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS top-10 hubs (customers) and authorities (suppliers) on the
    directed customer→supplier order graph → (role, node, paths, score,
    rank): the mutual-reinforcement centrality — a good hub buys from
    many good authorities, a good authority sells to many good hubs —
    complementing the symmetrized PageRank entry with the bipartite
    role-splitting variant. Iterations run as exact bigint path counts
    (associativity-free: Spark's partial aggregation and the oracle's
    unrolled CTEs agree bit-for-bit) with ONE L1-normalizing division at
    the end; ranking ties break on the exact integer before node id.
    Scale posture in `operators.graph.hits_scores`: edges checkpoint
    once clustered on src; each iteration is one src-keyed join plus one
    map-side-combinable sum."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    scored = hits_scores(edges, iterations=3)
    w = Window.partitionBy("role").orderBy(F.desc("paths"), F.asc("node"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "role",
            "node",
            "paths",
            "score",
            F.col("rank").cast("bigint").alias("rank"),
        )
        .orderBy("role", "rank")
    )
