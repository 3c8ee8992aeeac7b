"""Round-7f battery additions — the training-data-pipeline QA layer:
tokenizer fertility per language (the multilingual-fairness metric over
the trained BPE), a T5-style span-corruption masking plan, n-gram
novelty of a held-out slice vs train (the memorization/generalization
split metric), deterministic contrastive-triplet mining (anchor /
nearest-positive / hash-sampled negatives with margins), and the
per-user behavioral-entropy profile.

Each entry pairs the Spark plan with a DuckDB oracle that restates the
semantics independently. Registered into the shared REGISTRY on import
(see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.text import tokens, word_ngrams
from flight_radar_pipeline_spark.operators import similarity as S
from flight_radar_pipeline_spark.operators.corpus_prep import unit_hash
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.plans.battery_corpus import (
    _BPE_N,
    _bpe_iter_cte,
)
from flight_radar_pipeline_spark.plans.battery_prep import (
    _TRIGRAMS_SQL,
    _unit_hash_sql,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# BPE fertility per language (subwords per word, trained tokenizer)
# --------------------------------------------------------------------------


def _fertility_oracle() -> str:
    ctes = ", ".join(_bpe_iter_cte(i) for i in range(1, _BPE_N + 1))
    return rf"""
    with words as (
        select word, count(*) as freq from (
            select unnest(regexp_split_to_array(trim(text), '\s+')) as word
            from documents
        ) group by word
    ), v0 as (
        select word, freq, regexp_replace(word, '(.)', '(\1)', 'g') as seq
        from words
    ), {ctes}, enc as (
        select word,
               len(regexp_extract_all(seq, '\(([^)]+)\)', 1)) as n_sym
        from v{_BPE_N}
    ), tokd as (
        select doc_id, lang,
               unnest(regexp_split_to_array(trim(text), '\s+')) as word
        from documents
    )
    select lang,
           cast(count(distinct doc_id) as bigint) as n_docs,
           cast(count(*) as bigint) as n_words,
           cast(sum(n_sym) as bigint) as n_subwords,
           round(sum(n_sym) / (count(*) * 1.0), 4) as fertility
    from tokd join enc using (word)
    group by lang order by lang
"""


@register("doc_bpe_fertility", _fertility_oracle())
def doc_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language → (lang, n_docs, n_words,
    n_subwords, fertility): subwords-per-word under the corpus-trained
    BPE merges — the multilingual-fairness metric (a language whose
    fertility runs 2× pays 2× the context budget and 2× the inference
    cost per word; tokenizer-parity debates run on exactly this
    number). Consumes the battery's BPE machinery: merges train once on
    the vocabulary grain, each distinct word encodes once, and the
    corpus joins word → symbol count (`operators.bpe`). All counts are
    exact integers; fertility is one division of exact sums. Scale:
    vocabulary-sized training + one gram-keyed join, the
    `doc_bpe_encode` posture with a |langs|-row aggregate on top."""
    from flight_radar_pipeline_spark.operators.bpe import encode_token_counts

    docs = load_table(spark, sf_dir, "documents")
    per_doc = encode_token_counts(docs, n_merges=_BPE_N)
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_subwords").cast("bigint").alias("n_subwords"),
            F.round(
                F.sum("n_subwords") / (F.sum("n_words") * F.lit(1.0)), 4
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# T5-style span-corruption masking plan
# --------------------------------------------------------------------------

_MASK_RATE = 0.15

_SPAN_ORACLE = rf"""
    with d as (
        select doc_id, lang,
               len(regexp_split_to_array(trim(text), '\s+')) as ntok
        from documents
    ), pos as (
        select doc_id, lang, ntok, unnest(range(0, ntok)) as p
        from d
    ), masked as (
        select doc_id, lang, ntok, p,
               p - row_number() over (partition by doc_id order by p) as grp
        from pos
        where {_unit_hash_sql("doc_id::varchar || '-' || p::varchar", "mask")}
              < {_MASK_RATE}
    ), per_doc as (
        select doc_id, lang, max(ntok) as ntok,
               count(*) as n_masked,
               count(distinct grp) as n_spans
        from masked group by doc_id, lang
    )
    select lang,
           cast(count(*) as bigint) as n_docs,
           cast(sum(ntok) as bigint) as n_tokens,
           cast(sum(n_masked) as bigint) as n_masked,
           cast(sum(n_spans) as bigint) as n_spans,
           round(sum(n_masked) / (sum(ntok) * 1.0), 4) as mask_ratio,
           round(sum(n_masked) / (sum(n_spans) * 1.0), 4) as avg_span_len
    from per_doc group by lang order by lang
"""


@register("doc_span_corruption_plan", _SPAN_ORACLE)
def doc_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption masking plan → (lang, n_docs, n_tokens,
    n_masked, n_spans, mask_ratio, avg_span_len): each token position
    masks independently at {_MASK_RATE} via the deterministic unit
    hash (rerun/partition/engine-invariant — the property that makes a
    masking plan REPRODUCIBLE across trainer restarts), and consecutive
    masked positions fuse into spans by the gaps-and-islands identity
    (pos − row_number is constant within a run). The realized ratio and
    the geometric-ish span-length distribution are the sanity numbers a
    denoising-objective pipeline checks before burning GPU-hours.

    Scale: position explode is row-local (no shuffle until the per-doc
    aggregate); the islands window partitions by doc_id — bounded by
    document length, never global. All-integer outputs + exact-sum
    ratios: engine-exact by construction."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang", F.size(tokens("text")).alias("ntok")
    )
    pos = d.select(
        "doc_id",
        "lang",
        "ntok",
        F.explode(F.sequence(F.lit(0), F.col("ntok") - 1)).alias("p"),
    )
    u = unit_hash(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("-"), F.col("p").cast("string")
        ),
        "mask",
    )
    w_doc = Window.partitionBy("doc_id").orderBy("p")
    masked = pos.filter(u < _MASK_RATE).withColumn(
        "grp", F.col("p") - F.row_number().over(w_doc)
    )
    per_doc = masked.groupBy("doc_id", "lang").agg(
        F.max("ntok").alias("ntok"),
        F.count(F.lit(1)).alias("n_masked"),
        F.countDistinct("grp").alias("n_spans"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
            F.sum("n_masked").cast("bigint").alias("n_masked"),
            F.sum("n_spans").cast("bigint").alias("n_spans"),
            F.round(
                F.sum("n_masked") / (F.sum("ntok") * F.lit(1.0)), 4
            ).alias("mask_ratio"),
            F.round(
                F.sum("n_masked") / (F.sum("n_spans") * F.lit(1.0)), 4
            ).alias("avg_span_len"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# n-gram novelty: held-out trigrams unseen in train
# --------------------------------------------------------------------------

_NOVEL_TRAIN_FRAC = 0.7

_NOVEL_ORACLE = rf"""
    with d as (
        select doc_id, lang,
               regexp_split_to_array(trim(text), '\s+') as toks,
               {_unit_hash_sql("doc_id::varchar", "novel")} as u
        from documents
    ), tg as (
        select doc_id, lang, u, unnest({_TRIGRAMS_SQL}) as gram
        from d
    ), train_grams as (
        select distinct gram from tg where u < {_NOVEL_TRAIN_FRAC}
    ), ev as (
        select t.lang, t.doc_id, t.gram,
               case when tr.gram is null then 1 else 0 end as novel
        from tg t left join train_grams tr using (gram)
        where t.u >= {_NOVEL_TRAIN_FRAC}
    )
    select lang,
           cast(count(distinct doc_id) as bigint) as n_eval_docs,
           cast(count(*) as bigint) as n_grams,
           cast(sum(novel) as bigint) as n_novel,
           round(sum(novel) / (count(*) * 1.0), 4) as novelty_rate
    from ev group by lang order by lang
"""


@register("doc_ngram_novelty", _NOVEL_ORACLE)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out n-gram novelty → (lang, n_eval_docs, n_grams, n_novel,
    novelty_rate): fraction of the eval slice's word trigrams never
    seen in the train slice (deterministic-hash split) — the
    memorization/generalization yardstick: a near-zero rate means the
    held-out data is assembled from memorized fragments; high rates
    mean genuine novelty. The dual of `doc_decontamination`: that
    entry REMOVES overlap, this one MEASURES the remaining surprise.
    Scale: ONE tokenize+explode pass and ONE gram-keyed shuffle — the
    train-membership flag is a window max over the gram partition
    (round-13, guide §2.2/§2.4: the previous agg-then-join-back shape
    ran the tokenize/gram explode once under EACH side of the join and
    paid the gram shuffle twice; `seen(gram) = max(is_train) over
    (partition by gram)` is identically NULL-free EXISTS). The token
    array is hoisted into its own projection so the interpreted gram
    build evaluates once per row, not once per reference. Never
    |train|×|eval|. All-integer outputs."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        tokens("text").alias("__toks"),
        unit_hash("doc_id", "novel").alias("u"),
    )
    d = toks.select(
        "doc_id", "lang", "u", word_ngrams(F.col("__toks"), 3).alias("grams")
    )
    tg = d.select("doc_id", "lang", "u", F.explode("grams").alias("gram"))
    w_g = Window.partitionBy("gram")
    ev = (
        tg.withColumn(
            "__seen",
            F.max(
                F.when(F.col("u") < _NOVEL_TRAIN_FRAC, 1).otherwise(0)
            ).over(w_g),
        )
        .filter(F.col("u") >= _NOVEL_TRAIN_FRAC)
        .select(
            "lang",
            "doc_id",
            F.when(F.col("__seen") == 0, 1).otherwise(0).alias("novel"),
        )
    )
    return (
        ev.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_eval_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("novel").cast("bigint").alias("n_novel"),
            F.round(
                F.sum("novel") / (F.count(F.lit(1)) * F.lit(1.0)), 4
            ).alias("novelty_rate"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# contrastive triplet mining: anchor / top-1 positive / hash negatives
# --------------------------------------------------------------------------

_TRIP_ANCHORS = 32
_TRIP_NEGS = 4

_TRIP_ORACLE = f"""
    with q as (
        select vec_id as anchor_id, embedding::DOUBLE[] as qv
        from embeddings where vec_id < {_TRIP_ANCHORS}
    ), c as (
        select vec_id as cand_id, embedding::DOUBLE[] as cv from embeddings
    ), scored as (
        select anchor_id, cand_id,
               round(list_cosine_similarity(qv, cv), 6) as cosine
        from q cross join c where anchor_id != cand_id
    ), pos as (
        select anchor_id, cand_id as positive_id, cosine as pos_cosine
        from (
            select *, row_number() over (
                partition by anchor_id order by cosine desc, cand_id
            ) as rn from scored
        ) where rn = 1
    ), negs as (
        select s.anchor_id, s.cand_id as negative_id,
               s.cosine as neg_cosine,
               row_number() over (
                   partition by s.anchor_id
                   order by {_unit_hash_sql(
                       "s.anchor_id::varchar || '-' || s.cand_id::varchar",
                       "neg")}, s.cand_id
               ) as neg_rank
        from scored s join pos p using (anchor_id)
        where s.cand_id != p.positive_id
    )
    select n.anchor_id, p.positive_id, n.negative_id,
           cast(n.neg_rank as bigint) as neg_rank,
           p.pos_cosine, n.neg_cosine,
           round(p.pos_cosine - n.neg_cosine, 6) as margin
    from negs n join pos p using (anchor_id)
    where n.neg_rank <= {_TRIP_NEGS}
    order by anchor_id, neg_rank
"""


@register("embedding_contrastive_triplets", _TRIP_ORACLE)
def embedding_contrastive_triplets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive triplet mining → (anchor_id, positive_id,
    negative_id, neg_rank, pos_cosine, neg_cosine, margin): for each
    anchor, positive = exact top-1 cosine neighbor and negatives =
    {_TRIP_NEGS} UNIFORM hash-sampled candidates (md5-ranked —
    partition/rerun/engine-invariant, the reproducible counterpart of
    random negative sampling), with the pos−neg margin the contrastive
    loss actually trains on. A margin histogram near 0 means the
    sampler is feeding trivial negatives — the QA readout before an
    embedding fine-tune.

    Scale: the anchor side is bounded ({_TRIP_ANCHORS} broadcast
    rows); candidate scoring is one corpus scan; negative selection is
    a per-anchor TakeOrdered on the hash key. At 100 TB the same shape
    holds with anchors batched."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _TRIP_ANCHORS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                S.cosine_similarity(F.col("qv"), F.col("cv")), 6
            ).alias("cosine"),
        )
    )
    # ONE pass over the scored relation (round-13): the positive is a
    # whole-partition max(struct(cosine, −id)) window — (cosine desc,
    # id asc) as struct order — and the negative rank is a second window
    # on the SAME partition key, so both share one anchor-keyed exchange
    # and the 32×N cosine scan runs once. The previous shape consumed
    # `scored` twice (top-1 subplan + broadcast join back), recomputing
    # the cross cosine scan per consumer.
    u = unit_hash(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit("-"),
            F.col("negative_id").cast("string"),
        ),
        "neg",
    )
    base = scored.select(
        F.col("query_id").alias("anchor_id"),
        F.col("neighbor_id").alias("negative_id"),
        F.col("cosine").alias("neg_cosine"),
    ).select("*", u.alias("u"))
    w_all = Window.partitionBy("anchor_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ps = F.max(
        F.struct(
            F.col("neg_cosine").alias("c"),
            (-F.col("negative_id")).alias("nid"),
        )
    ).over(w_all)
    enriched = base.select(
        "*",
        ps["c"].alias("pos_cosine"),
        (-ps["nid"]).alias("positive_id"),
    )
    w_neg = Window.partitionBy("anchor_id").orderBy(
        "u", F.asc("negative_id")
    )
    negs = (
        enriched.filter(F.col("negative_id") != F.col("positive_id"))
        .withColumn("neg_rank", F.row_number().over(w_neg))
        .filter(F.col("neg_rank") <= _TRIP_NEGS)
    )
    return (
        negs.select(
            "anchor_id",
            "positive_id",
            "negative_id",
            F.col("neg_rank").cast("bigint").alias("neg_rank"),
            "pos_cosine",
            "neg_cosine",
            F.round(F.col("pos_cosine") - F.col("neg_cosine"), 6).alias(
                "margin"
            ),
        )
        .orderBy("anchor_id", "neg_rank")
    )


# --------------------------------------------------------------------------
# per-user behavioral entropy profile
# --------------------------------------------------------------------------

_ENT_BINS = 10

_ENT_ORACLE = f"""
    with ut as (
        select user_id, cast(ts as date) as day, event_type,
               count(*) as cnt
        from events group by 1, 2, 3
    ), tot as (
        select user_id, day, sum(cnt) as n from ut group by 1, 2
    ), h as (
        select u.user_id, u.day,
               round(-sum((cnt / (n * 1.0)) * ln(cnt / (n * 1.0))), 6) as ent
        from ut u join tot t on u.user_id = t.user_id and u.day = t.day
        group by u.user_id, u.day
    ), binned as (
        select least(cast(floor(ent / (ln(5) / {_ENT_BINS})) as bigint),
                     {_ENT_BINS - 1}) as bin,
               ent
        from h
    )
    select bin, cast(count(*) as bigint) as n_user_days,
           round(count(*) / (sum(count(*)) over () * 1.0), 4) as share,
           round(avg(ent), 4) as avg_entropy
    from binned group by bin order by bin
"""


@register("user_type_entropy_profile", _ENT_ORACLE)
def user_type_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity profile → (bin, n_user_days, share,
    avg_entropy): Shannon entropy of each user-DAY's event-type mix, binned
    into {_ENT_BINS} fixed-width buckets of [0, ln 5] — separates
    single-action accounts (bin 0: bots, scrapers, abandoned signups)
    from full-mix users, the population-level segmentation signal the
    per-event anomaly entries can't see. Probabilities are exact
    integer-count ratios, so the per-user entropy is a deterministic
    double on both engines (rounded to 6 before binning — identical
    bin edges); everything aggregates at (user, type) grain then
    |users| rows."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_u = Window.partitionBy("user_id", "day")
    h = ut.select(
        "user_id",
        "day",
        (F.col("cnt") / (F.sum("cnt").over(w_u) * F.lit(1.0))).alias("p"),
    ).groupBy("user_id", "day").agg(
        F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("ent")
    )
    import math

    width = math.log(5) / _ENT_BINS
    binned = h.select(
        F.least(
            F.floor(F.col("ent") / F.lit(width)).cast("long"),
            F.lit(_ENT_BINS - 1),
        ).alias("bin"),
        "ent",
    )
    w_all = Window.partitionBy()
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_user_days"),
            F.round(F.avg("ent"), 4).alias("avg_entropy"),
        )
        .select(
            "bin",
            "n_user_days",
            F.round(
                F.col("n_user_days")
                / (F.sum("n_user_days").over(w_all) * F.lit(1.0)),
                4,
            ).alias("share"),
            "avg_entropy",
        )
        .orderBy("bin")
    )
