"""Round-7b battery additions: nonparametric two-sample and k-sample
rank tests (Mann–Whitney U, Kruskal–Wallis H), the t-closeness release
audit completing the k-anonymity / l-diversity governance family, and
three training-data selection operators — DSIR-style hashed-n-gram
importance weighting, temperature-flattened domain sampling, and MMR
(maximal-marginal-relevance) diversified re-ranking.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently. Registered into the shared REGISTRY on import
(see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash
from flight_radar_pipeline_spark.operators.prefix import ranged_cumulative
from flight_radar_pipeline_spark.operators.similarity import mmr_rerank
from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.plans.battery_prep import _unit_hash_sql
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# Mann–Whitney U: click vs view event values (pooled tie-averaged ranks)
# --------------------------------------------------------------------------

_MWU_ORACLE = """
    with v as (
        select value,
               count(*) as cnt,
               sum(case when event_type = 'click' then 1 else 0 end) as cnt1
        from events where event_type in ('click', 'view')
        group by value
    ), r as (
        select cnt, cnt1,
               sum(cnt) over (order by value
                              rows between unbounded preceding and current row)
                 - cnt + (cnt + 1) / 2.0 as midrank
        from v
    ), s as (
        select sum(cnt1) as n1, sum(cnt) as n,
               sum(midrank * cnt1) as r1,
               sum(cnt * cnt * cnt - cnt) as tsum
        from r
    )
    select cast(n1 as bigint) as n_click,
           cast(n - n1 as bigint) as n_view,
           round(r1 - n1 * (n1 + 1) / 2.0, 2) as u_click,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * (n - n1) / 2.0)
                 / sqrt(n1 * (n - n1) / 12.0
                        * ((n + 1) - tsum / (n * (n - 1.0)))), 4) as z,
           round(2.0 * (r1 - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1)) - 1, 4)
               as rank_biserial
    from s
"""


@register("event_value_mann_whitney", _MWU_ORACLE)
def event_value_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test comparing click vs view event values
    → one row (n_click, n_view, u_click, z, rank_biserial): the
    distribution-free two-sample location test for the heavy-tailed
    metrics where the t-test's mean is meaningless. Ties take average
    ranks; z uses the tie-corrected variance; rank-biserial is the
    effect size (P(click > view) − P(view > click)).

    Scale: ranks never touch fact rows — the stream collapses to the
    DISTINCT-VALUE pre-aggregate first (bounded by value cardinality,
    here |values| ≪ |events|), one cumulative window over that relation
    assigns pooled mid-ranks, and the test statistic is five partial-
    aggregable sums. For a truly continuous 100 TB column the same
    shape runs on quantized values (the mid-rank arithmetic is exact
    for any binning both engines share)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    v = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "cnt1"
        ),
    )
    # range-partitioned running count (round-10: the distinct-value grid
    # grows with the data; the global Window.orderBy was a one-task sort
    # at 100x) - identity on the exact bigint counts, oracle unchanged.
    # round-11: checkpoint the grid so the boundary probe reuses it
    # instead of re-scanning the fact (measured 1.10/0.87 -> 0.88/0.80 s
    # at sf0.1)
    r = ranged_cumulative(
        v, "value", ["cnt"], materialize_input=True
    ).select(
        "cnt",
        "cnt1",
        (
            F.col("cnt_cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("midrank"),
    )
    s = r.agg(
        F.sum("cnt1").alias("n1"),
        F.sum("cnt").alias("n"),
        F.sum(F.col("midrank") * F.col("cnt1")).alias("r1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tsum"),
    )
    n1, n, r1, tsum = F.col("n1"), F.col("n"), F.col("r1"), F.col("tsum")
    u1 = r1 - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        n1 * (n - n1) / 12.0 * ((n + 1) - tsum / (n * (n - 1.0)))
    )
    return s.select(
        n1.cast("bigint").alias("n_click"),
        (n - n1).cast("bigint").alias("n_view"),
        F.round(u1, 2).alias("u_click"),
        F.round((u1 - n1 * (n - n1) / 2.0) / sigma, 4).alias("z"),
        F.round(2.0 * u1 / (n1 * (n - n1)) - 1, 4).alias("rank_biserial"),
    )


# --------------------------------------------------------------------------
# Kruskal–Wallis H across all event types
# --------------------------------------------------------------------------

_KW_ORACLE = """
    with v as (
        select value, count(*) as cnt from events group by value
    ), r as (
        select value,
               sum(cnt) over (order by value
                              rows between unbounded preceding and current row)
                 - cnt + (cnt + 1) / 2.0 as midrank
        from v
    ), g as (
        select e.event_type, sum(r.midrank) as rg, count(*) as ng
        from events e join r on e.value = r.value
        group by e.event_type
    ), t as (
        select sum(cnt * cnt * cnt - cnt) as tsum from v
    ), s as (
        select count(*) as k, sum(ng) as n, sum(rg * rg / ng) as rterm
        from g
    )
    select cast(k as bigint) as k_groups,
           cast(n as bigint) as n,
           round(12.0 / (n * (n + 1)) * rterm - 3 * (n + 1), 4) as h,
           round((12.0 / (n * (n + 1)) * rterm - 3 * (n + 1))
                 / (1 - tsum / (n * n * n - n * 1.0)), 4) as h_adj
    from s, t
"""


@register("event_type_kruskal_wallis", _KW_ORACLE)
def event_type_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test across ALL event types → one row (k_groups,
    n, h, h_adj): the k-sample generalization of Mann–Whitney — does any
    event type's value distribution stochastically dominate? h_adj
    applies the tie correction. Same scale shape as the two-sample
    entry: pooled mid-ranks come from a cumulative window over the
    distinct-value pre-aggregate; per-group rank sums are one
    fact-grain join against that (broadcastable) rank table plus a
    |types|-sized aggregate."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    v = ev.groupBy("value").agg(F.count(F.lit(1)).alias("cnt"))
    # range-partitioned running count - same round-10 treatment as the
    # Mann-Whitney entry above; identity on exact counts. round-11:
    # same probe-reuse checkpoint (measured 1.18/0.88 -> 0.99/0.77 s)
    r = ranged_cumulative(
        v, "value", ["cnt"], materialize_input=True
    ).select(
        "value",
        "cnt",
        (
            F.col("cnt_cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
        ).alias("midrank"),
    )
    g = (
        ev.join(F.broadcast(r.select("value", "midrank")), "value")
        .groupBy("event_type")
        .agg(F.sum("midrank").alias("rg"), F.count(F.lit(1)).alias("ng"))
    )
    # tie-correction needs only the tie counts, not the midranks —
    # aggregate the PRE-helper grid so the ranked lineage isn't
    # re-derived for one sum (round-10 exchange trim)
    tsum_df = v.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tsum")
    )
    s = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("rterm"),
    )
    joined = s.crossJoin(F.broadcast(tsum_df))
    n = F.col("n")
    h = 12.0 / (n * (n + 1)) * F.col("rterm") - 3 * (n + 1)
    return joined.select(
        F.col("k").cast("bigint").alias("k_groups"),
        n.cast("bigint").alias("n"),
        F.round(h, 4).alias("h"),
        F.round(h / (1 - F.col("tsum") / (n * n * n - n * 1.0)), 4).alias(
            "h_adj"
        ),
    )


# --------------------------------------------------------------------------
# t-closeness: sensitive-attribute distribution distance per QI group
# --------------------------------------------------------------------------

_TCLOSE_ORACLE = """
    with g as (
        select c_nationkey as nation,
               cast(floor(c_acctbal / 1000) as bigint) as bal_band,
               c_mktsegment as seg, count(*) as cnt
        from customer group by 1, 2, 3
    ), gdist as (
        select c_mktsegment as seg,
               count(*) / (select count(*)::double from customer) as gshare
        from customer group by 1
    ), tot as (
        select nation, bal_band, sum(cnt) as n_customers from g
        group by 1, 2
    )
    select t.nation, t.bal_band,
           cast(t.n_customers as bigint) as n_customers,
           round(0.5 * (sum(abs(g.cnt / t.n_customers::double - gl.gshare))
                        + 1 - sum(gl.gshare)), 4) as t_distance
    from g join tot t using (nation, bal_band)
    join gdist gl using (seg)
    group by t.nation, t.bal_band, t.n_customers
    order by t.nation, t.bal_band
"""


@register("customer_t_closeness", _TCLOSE_ORACLE)
def customer_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit → (nation, bal_band, n_customers, t_distance):
    total-variation distance between each quasi-identifier group's
    sensitive-attribute (market segment) distribution and the global
    one — the release check l-diversity (`customer_l_diversity`)
    misses: a group can be diverse yet skewed far from the population,
    so membership still shifts an attacker's posterior. Segments absent
    from a group contribute their full global mass (the
    Σ|p−q| identity: present terms + (1 − Σ present global shares)).
    Scale: two dimension-sized aggregates + a 5-row broadcast; nothing
    beyond the (nation, band, seg) grain ever shuffles."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        F.col("c_mktsegment").alias("seg"),
    )
    g = c.groupBy("nation", "bal_band", "seg").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_all = Window.partitionBy()
    glob = (
        c.groupBy("seg")
        .agg(F.count(F.lit(1)).alias("gcnt"))
        .select(
            "seg",
            (F.col("gcnt") / F.sum("gcnt").over(w_all)).alias("gshare"),
        )
    )
    w_grp = Window.partitionBy("nation", "bal_band")
    joined = (
        g.withColumn("n_customers", F.sum("cnt").over(w_grp))
        .join(F.broadcast(glob), "seg")
    )
    return (
        joined.groupBy("nation", "bal_band", "n_customers")
        .agg(
            F.round(
                0.5
                * (
                    F.sum(
                        F.abs(
                            F.col("cnt") / F.col("n_customers") - F.col("gshare")
                        )
                    )
                    + 1
                    - F.sum("gshare")
                ),
                4,
            ).alias("t_distance")
        )
        .select(
            "nation",
            "bal_band",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            "t_distance",
        )
        .orderBy("nation", "bal_band")
    )


# --------------------------------------------------------------------------
# DSIR-style importance weighting: hashed unigram LLR vs a target slice
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 64

_DSIR_ORACLE = f"""
    with tok as (
        select doc_id, lang,
               ('0x' || substr(md5(unnest(
                   regexp_split_to_array(trim(text), '\\s+'))), 1, 6))::bigint
                 % {_DSIR_BUCKETS} as bucket
        from documents
    ), bc as (
        select bucket,
               count(*) as n_r,
               sum(case when lang = 'en' then 1 else 0 end) as n_t
        from tok group by bucket
    ), tots as (
        select sum(n_r) as tr, sum(n_t) as tt from bc
    ), llr as (
        select bucket,
               round(ln(((n_t + 1) / (tt + {_DSIR_BUCKETS}.0))
                        / ((n_r + 1) / (tr + {_DSIR_BUCKETS}.0))), 6) as w
        from bc, tots
    ), perdoc as (
        select t.doc_id, t.lang,
               round(sum(l.w) / count(*), 6) as score
        from tok t join llr l using (bucket)
        group by t.doc_id, t.lang
    )
    select lang, cast(count(*) as bigint) as n_docs,
           round(avg(score), 4) as avg_llr,
           cast(sum(case when score > 0 then 1 else 0 end) as bigint)
               as n_selected
    from perdoc group by lang
    order by lang
"""


@register("doc_dsir_importance", _DSIR_ORACLE)
def doc_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection with importance resampling (hashed-
    n-gram variant, after Xie et al. 2023) → (lang, n_docs, avg_llr,
    n_selected): every token hashes into {_DSIR_BUCKETS} md5 buckets;
    the target distribution is the English slice and the raw
    distribution the whole corpus; each bucket gets a Laplace-smoothed
    log-likelihood ratio; a document's importance score is its mean
    token LLR, and `n_selected` counts docs the ratio test keeps
    (score > 0 ⇔ closer to target than to raw).

    Scale: the feature space is FIXED ({_DSIR_BUCKETS} buckets) no
    matter the corpus — the two distribution estimates are one
    map-side-combinable aggregate, the LLR table broadcasts everywhere,
    and per-doc scoring is one (doc_id)-keyed aggregate over the token
    stream. This is the importance-weighting shape that lets a 100 TB
    raw crawl be scored against a small high-quality target corpus
    without any vocabulary shuffle. Both engines round the bucket LLR
    and the per-doc mean to 6 before the final 4-digit report, pinning
    float-association-order drift."""
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
            % _DSIR_BUCKETS
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
                ((F.col("n_t") + 1) / (F.sum("n_t").over(w_all) + float(_DSIR_BUCKETS)))
                / ((F.col("n_r") + 1) / (F.sum("n_r").over(w_all) + float(_DSIR_BUCKETS)))
            ),
            6,
        ).alias("w"),
    )
    perdoc = (
        tok.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id", "lang")
        .agg(F.round(F.sum("w") / F.count(F.lit(1)), 6).alias("score"))
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_llr"),
            F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_selected"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# temperature-flattened domain sampling
# --------------------------------------------------------------------------

_TEMP_ALPHA = 0.5
_TEMP_BUDGET_FRAC = 0.4

_TEMP_ORACLE = f"""
    with counts as (
        select lang, count(*) as n_docs from documents group by lang
    ), shares as (
        select lang, n_docs,
               n_docs / sum(n_docs) over () as raw_share,
               pow(n_docs, {_TEMP_ALPHA}) / sum(pow(n_docs, {_TEMP_ALPHA}))
                   over () as temp_share,
               sum(n_docs) over () as n_total
        from counts
    ), rates as (
        select lang, n_docs, raw_share, temp_share,
               round(least(1.0, temp_share * ({_TEMP_BUDGET_FRAC} * n_total)
                                / n_docs), 6) as rate
        from shares
    )
    select r.lang, cast(r.n_docs as bigint) as n_docs,
           round(r.raw_share, 4) as raw_share,
           round(r.temp_share, 4) as temp_share,
           r.rate,
           cast(sum(case when {_unit_hash_sql("d.doc_id::varchar", "temp")}
                         < r.rate then 1 else 0 end) as bigint) as n_sampled
    from documents d join rates r using (lang)
    group by r.lang, r.n_docs, r.raw_share, r.temp_share, r.rate
    order by r.lang
"""


@register("doc_lang_temperature_sample", _TEMP_ORACLE)
def doc_lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language sampling → (lang, n_docs,
    raw_share, temp_share, rate, n_sampled): target shares follow
    n^α / Σn^α (α = 0.5) — the multilingual-training flattening that
    up-weights tail languages relative to their raw frequency — against
    a total budget that SELF-SIZES to 40% of the corpus count (no
    fixed-row constant to go stale at 100 TB). Selection is
    deterministic `unit_hash` thresholding, mirrored bit-for-bit in the
    oracle, so the realized mix is rerun- and partition-invariant.
    Scale: same two-scan shape as `doc_mixture_sample`: a |langs|-sized
    count aggregate, shares via windows over that tiny relation, rates
    broadcast back over the corpus for one conditional count."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    rates = counts.select(
        "lang",
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w_all)).alias("raw_share"),
        (
            F.pow("n_docs", _TEMP_ALPHA)
            / F.sum(F.pow("n_docs", _TEMP_ALPHA)).over(w_all)
        ).alias("temp_share"),
        F.sum("n_docs").over(w_all).alias("n_total"),
    ).select(
        "lang",
        "n_docs",
        "raw_share",
        "temp_share",
        F.round(
            F.least(
                F.lit(1.0),
                F.col("temp_share")
                * (F.lit(_TEMP_BUDGET_FRAC) * F.col("n_total"))
                / F.col("n_docs"),
            ),
            6,
        ).alias("rate"),
    )
    u = unit_hash("doc_id", "temp")
    return (
        docs.select("lang", u.alias("__u"))
        .join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", "raw_share", "temp_share", "rate")
        .agg(
            F.sum(F.when(F.col("__u") < F.col("rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled")
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round("raw_share", 4).alias("raw_share"),
            F.round("temp_share", 4).alias("temp_share"),
            "rate",
            "n_sampled",
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# MMR diversified re-ranking
# --------------------------------------------------------------------------

_MMR_N = 16
_MMR_K = 5
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as a CTE chain (the Lloyd's-unroll pattern):
    sel1 is the pure-relevance argmax; each later round scores the
    not-yet-selected shortlist rows as λ·rel − (1−λ)·max-sim-to-selected
    and picks the rounded argmax with an id tiebreak."""
    lam, one_m = _MMR_LAM, round(1 - _MMR_LAM, 10)
    parts = [f"""
    with q as (
        select vec_id as query_id, embedding::DOUBLE[] as qv
        from embeddings where vec_id < 4
    ), c as (
        select vec_id as neighbor_id, embedding::DOUBLE[] as cv
        from embeddings
    ), scored as (
        select query_id, neighbor_id,
               round(list_cosine_similarity(qv, cv), 6) as relevance, cv
        from q cross join c where query_id != neighbor_id
    ), short as (
        select query_id, neighbor_id, relevance, cv from (
            select *, row_number() over (
                partition by query_id order by relevance desc, neighbor_id
            ) as rn from scored
        ) where rn <= {_MMR_N}
    ), pairs as (
        select s1.query_id, s1.neighbor_id as ia, s2.neighbor_id as ib,
               round(list_cosine_similarity(s1.cv, s2.cv), 6) as sim
        from short s1 join short s2
          on s1.query_id = s2.query_id and s1.neighbor_id != s2.neighbor_id
    ), sel1 as (
        select query_id, 1 as rank, neighbor_id, relevance,
               round({lam} * relevance, 7) as mmr_score
        from (
            select *, row_number() over (
                partition by query_id order by relevance desc, neighbor_id
            ) as rn from short
        ) where rn = 1
    )"""]
    for i in range(2, _MMR_K + 1):
        parts.append(f""", cand{i} as (
        select s.query_id, s.neighbor_id, s.relevance,
               round({lam} * s.relevance - {one_m} * max(p.sim), 7)
                   as mmr_score
        from short s
        join pairs p
          on p.query_id = s.query_id and p.ia = s.neighbor_id
        join sel{i - 1} t
          on t.query_id = p.query_id and t.neighbor_id = p.ib
        where not exists (
            select 1 from sel{i - 1} x
            where x.query_id = s.query_id
              and x.neighbor_id = s.neighbor_id
        )
        group by s.query_id, s.neighbor_id, s.relevance
    ), pick{i} as (
        select query_id, {i} as rank, neighbor_id, relevance, mmr_score
        from (
            select *, row_number() over (
                partition by query_id order by mmr_score desc, neighbor_id
            ) as rn from cand{i}
        ) where rn = 1
    ), sel{i} as (
        select * from sel{i - 1} union all select * from pick{i}
    )""")
    parts.append(f"""
    select query_id, rank, neighbor_id, relevance, mmr_score
    from sel{_MMR_K} order by query_id, rank
    """)
    return "".join(parts)


@register("embedding_mmr_topk", _mmr_oracle())
def embedding_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-{_MMR_K} for 4 query vectors → (query_id,
    rank, neighbor_id, relevance, mmr_score): greedy maximal marginal
    relevance over an exact {_MMR_N}-deep cosine shortlist, λ = 0.7.
    The training-data-selection re-ranker: pure relevance top-k returns
    near-duplicates of each other; MMR's diversity penalty covers the
    shortlist's distinct regions instead. Scale posture lives in
    `operators.similarity.mmr_rerank`: one corpus scan builds the
    shortlist, the k greedy rounds run on the shortlist-bounded
    relation only (the oracle unrolls the same greedy path as a CTE
    chain; both engines round every score to 6 before each argmax so
    the selection sequence is engine-portable)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    return mmr_rerank(
        emb, queries, shortlist_n=_MMR_N, k=_MMR_K, lam=_MMR_LAM
    ).orderBy("query_id", "rank")


@register_grid_plans("embedding_mmr_topk")
def _mmr_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build-time subplans of the round-13 driver-greedy mmr_rerank —
    the checkpointed shortlist and pair matrix the bounded collects
    read — registered so the corpus-sized work stays plan-audited.
    Built by the SAME helpers the operator executes
    (``similarity._mmr_shortlist`` / ``_mmr_pair_matrix``), so the
    audited subplans cannot desynchronize from the operator's internals
    (round-14, ADVICE fix — this function previously restated the
    construction by hand)."""
    from flight_radar_pipeline_spark.operators.similarity import (
        _mmr_pair_matrix,
        _mmr_shortlist,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    short = _mmr_shortlist(
        emb, queries, _MMR_N, "vec_id", "embedding", decimals=6
    )
    pairs = _mmr_pair_matrix(short, decimals=6)
    return {"shortlist": short, "pair_matrix": pairs}
