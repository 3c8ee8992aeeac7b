"""Round-12 battery additions — two corpus-modeling families the
registry genuinely lacks (pre-registration sweep per the standing
dedup-honesty rule: `grep @register` names + family keywords):

- Multinomial Naive Bayes language classifier trained IN THE ENGINE:
  the CLOSED-FORM member of the in-engine trainer family. The registry
  fits a discriminative model iteratively (`doc_domain_classifier_gd`,
  unrolled GD) and a heuristic language ID (`doc_lang_id`, n-gram
  rules); nothing trains a generative classifier whose "training" is
  ONE aggregate — the fastText-shaped hashed-bag model real corpus
  pipelines use for cheap lang/quality routing. Scoring is exact
  integer arithmetic end to end (micro-nat weights), so the argmax is
  engine- and partition-order-independent by construction.
- Heaps'-law vocabulary-growth fit: V(N) ≈ K·N^β over
  document-id-ordered corpus prefixes — the growth-law companion to
  `corpus_zipf_fit` (frequency-vs-rank) that answers a different
  question: how fast does NEW vocabulary appear as the corpus grows
  (tokenizer sizing, crawl-dedup health; a β drifting toward 1 flags
  boilerplate/near-dup injection, toward 0 a stalled crawl).

Candidates DROPPED by the sweep before registration: best-fit-decreasing
compaction planning (the no-straddle first-fit entry owns the
sequential bin-packing family), Platt scaling (a 1-feature logistic —
`doc_domain_classifier_gd` owns the GD-logistic shape and
`event_score_isotonic_fit` owns calibration), MRR (`embedding_ann_ndcg`
owns ranked-retrieval quality; MRR is a degenerate nDCG), and
frequent event bigrams (`event_type_transitions` already materializes
the full bigram count grid).

Registered into the shared REGISTRY on import.
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
# Multinomial Naive Bayes language classifier (hashed bag of tokens)
# --------------------------------------------------------------------------

_NB_BUCKETS = 64  # shared with the DSIR / GD hashed feature space


def _tok(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket): one row per token occurrence, hashed into
    the 64-bucket md5 feature space the DSIR and GD entries share, with
    the document's language carried along so neither training nor
    scoring ever joins back to the corpus.

    The doc_id repartition ahead of the explode moves the COMPACT
    pre-explode rows (the standard redistribution before a ~50× token
    fan-out) so the generate + partial-aggregate stage parallelizes even
    when the input arrives as one file/row-group — the shuffled side is
    the tiny one at any scale."""
    return docs.repartition("doc_id").select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term"),
    ).select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("term"), 1, 6), 16, 10).cast("long")
            % _NB_BUCKETS
        ).alias("bucket"),
    )


def _nb_class_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training aggregate: per-language document counts (priors) —
    the bounded |langs|-row grid the entry collects at build time."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))


def _nb_token_counts(docs: DataFrame) -> DataFrame:
    """(lang, bucket, c): the training aggregate — one
    map-side-combinable pass over the token stream. ADDITIVE by
    construction, which is what lets the streaming twin maintain the
    model as mergeable integer partials."""
    return _tok(docs).groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def _nb_dense_from_counts(cnt: DataFrame) -> DataFrame:
    """(lang, bucket, wint): Laplace-smoothed log-likelihood weights in
    MICRO-NATS (bigint) over the DENSE |langs|×64 grid, from a
    (lang, bucket, c) count table. Integer weights are the parity
    discipline: per-doc scores are exact bigint sums, so no engine's
    float-summation order can move an argmax."""
    tots = cnt.groupBy("lang").agg(F.sum("c").alias("tot"))
    # densify by exploding the bucket range off the |langs|-row totals —
    # no join is needed to manufacture the grid (a range crossJoin would
    # be a BroadcastNestedLoopJoin for nothing)
    return (
        tots.select(
            "lang",
            "tot",
            F.explode(F.sequence(F.lit(0), F.lit(_NB_BUCKETS - 1))).alias(
                "__b"
            ),
        )
        .select("lang", "tot", F.col("__b").cast("long").alias("bucket"))
        .join(cnt, ["lang", "bucket"], "left")
        .select(
            "lang",
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("tot") + float(_NB_BUCKETS))
                )
                * 1e6,
                0,
            )
            .cast("long")
            .alias("wint"),
        )
    )


def _nb_weights_pivoted(dense: DataFrame, langs: list[str]) -> DataFrame:
    """Pivot the dense weight grid to one row per bucket (w_0..w_{k-1}
    in sorted-language order) for the broadcast scoring join."""
    return dense.groupBy("bucket").agg(
        *[
            F.sum(F.when(F.col("lang") == lang, F.col("wint"))).alias(
                f"w_{i}"
            )
            for i, lang in enumerate(langs)
        ]
    )


@register_grid_plans("doc_nb_lang_classifier")
def _nb_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # `class_grid` is the build-time bounded collect (langs + priors);
    # `weights` is the training aggregate the final plan consumes
    docs = load_table(spark, sf_dir, "documents")
    return {
        "class_grid": _nb_class_grid(spark, sf_dir),
        "weights": _nb_dense_from_counts(_nb_token_counts(docs)),
    }


_NB_ORACLE = f"""
    with tok as (
        select doc_id,
               ('0x' || substr(md5(unnest(
                   regexp_split_to_array(trim(text), '\\s+'))), 1, 6))::bigint
                 % {_NB_BUCKETS} as bucket
        from documents
    ), pri as (
        select lang,
               round(ln(count(*) / (select count(*)::double from documents))
                     * 1e6)::bigint as prior
        from documents group by lang
    ), cnt as (
        select d.lang, t.bucket, count(*) as c
        from tok t join documents d using (doc_id)
        group by 1, 2
    ), tots as (
        select lang, sum(c) as tot from cnt group by lang
    ), w as (
        select l.lang, b.bucket,
               round(ln((coalesce(c.c, 0) + 1) / (t.tot + {_NB_BUCKETS}.0))
                     * 1e6)::bigint as wint
        from (select distinct lang from documents) l
        cross join (select unnest(range(0, {_NB_BUCKETS})) as bucket) b
        join tots t on t.lang = l.lang
        left join cnt c on c.lang = l.lang and c.bucket = b.bucket
    ), sums as (
        select t.doc_id, w.lang, sum(w.wint)::bigint as s
        from tok t join w using (bucket)
        group by 1, 2
    ), pred as (
        select doc_id, lang as pred_lang from (
            select s.doc_id, s.lang,
                   row_number() over (
                       partition by s.doc_id
                       order by p.prior + s.s desc, s.lang
                   ) as rn
            from sums s join pri p using (lang)
        ) where rn = 1
    )
    select d.lang as true_lang, p.pred_lang, count(*)::bigint as n_docs
    from documents d join pred p using (doc_id)
    group by 1, 2
    order by 1, 2
"""


@register("doc_nb_lang_classifier", _NB_ORACLE)
def doc_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained and evaluated
    in-engine → the |langs|² confusion grid (true_lang, pred_lang,
    n_docs): hashed-bag token counts per language with Laplace
    smoothing, class priors from document counts, per-document argmax of
    prior + Σ log-likelihood — the closed-form generative counterpart to
    the unrolled-GD discriminative trainer, and the fastText-shaped
    model production corpora use for cheap routing.

    Parity discipline: log-weights and priors quantize to MICRO-NAT
    BIGINTS before any per-document sum, so scores are exact integers —
    no float summation order exists to disagree across engines or
    partitionings; ties break on language ascending in both.

    Scale posture: the model is a 64×|langs| integer grid (training =
    one map-side-combinable fact aggregate; the pivoted weight table
    broadcasts); scoring is one token-explode scan + one doc-grain
    bigint aggregate; the confusion output is |langs|² rows. The only
    driver action is the bounded |langs|-row prior collect (the
    broadcast-literal class; subplans audited via GRID_PLANS)."""
    docs = load_table(spark, sf_dir, "documents")
    grid = sorted(
        (r["lang"], int(r["n_docs"]))
        for r in _nb_class_grid(spark, sf_dir).collect()
    )
    langs, priors = _nb_priors(grid)
    weights = _nb_weights_pivoted(
        _nb_dense_from_counts(_nb_token_counts(docs)), langs
    )
    return _nb_confusion(docs, langs, priors, weights)


def _nb_priors(grid: list[tuple[str, int]]) -> tuple[list[str], dict]:
    """sorted languages + micro-nat integer priors from the
    (lang, n_docs) grid — half-up away from zero, matching the oracle's
    round() on the same doubles (Python's built-in round is banker's —
    not used)."""
    import math

    langs = [lang for lang, _n in grid]
    n_tot = float(sum(n for _l, n in grid))
    priors = {
        lang: int(
            math.copysign(
                math.floor(abs(math.log(n / n_tot) * 1e6) + 0.5),
                math.log(n / n_tot),
            )
        )
        for lang, n in grid
    }
    return langs, priors


def _nb_confusion(
    docs: DataFrame, langs: list[str], priors: dict, weights: DataFrame
) -> DataFrame:
    """Score the corpus against a trained (priors, pivoted-weights)
    model → the |langs|² confusion grid. The token stream carries
    (doc_id, true lang), so the per-document integer sums and the
    confusion grid need no join back to the corpus — one explode scan,
    one doc-grain aggregate."""
    sums = (
        _tok(docs)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", F.col("lang").alias("true_lang"))
        .agg(*[F.sum(f"w_{i}").alias(f"s_{i}") for i in range(len(langs))])
    )
    scores = [
        (F.lit(priors[lang]).cast("long") + F.col(f"s_{i}")).alias(f"sc_{i}")
        for i, lang in enumerate(langs)
    ]
    scored = sums.select("true_lang", *scores)
    # argmax by (score desc, lang asc): langs are sorted, so the greater
    # struct (score, -index) is exactly the winner with the asc tiebreak
    best = F.greatest(
        *[
            F.struct(
                F.col(f"sc_{i}").alias("s"), F.lit(-i).alias("nk")
            )
            for i in range(len(langs))
        ]
    )
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return (
        scored.select(
            "true_lang",
            F.element_at(lang_arr, (-best["nk"] + 1).cast("int")).alias(
                "pred_lang"
            ),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


@register("doc_nb_stream_train", _NB_ORACLE)
def doc_nb_stream_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Naive Bayes maintenance — the stream twin of
    `doc_nb_lang_classifier`, extending the lake family's batch/stream
    symmetry to the TRAINER class: documents arrive in 3 microbatches
    (hash-split files) and ``foreachBatch`` folds each batch's
    (lang, bucket) token counts and (lang) document counts into a
    versioned integer state table — merge = unionByName + sum by key,
    exact for any batch split because the training aggregate is
    additive integer partials (the same mergeability KMV/rollup lean
    on). After the stream drains, priors and micro-nat weights derive
    from the MAINTAINED state and the full corpus scores against them;
    the confusion grid must equal the batch trainer's, which is what
    the shared oracle states. This is the online-model-update pattern:
    a 100 TB corpus feed keeps one bounded integer grid per class and
    never revisits history to retrain.

    State maintenance is the DELTA fold (round-13, per the r12 verdict
    directive 4): each microbatch appends ONLY its own (lang, bucket)
    integer partial — never re-reads or re-writes the cumulative state —
    and the model materializes with one merge-on-read over the deltas
    after the stream drains (``streaming.ledger.
    fold_chronological_waves_delta``, the W₁ ledger's harness). The NB
    partials are additive integers, the delta fold's exact
    precondition, so merge ≡ retrain is unchanged for any batch split.
    vs the copy-on-write fold this drops one read-prev + re-aggregate +
    rewrite cycle per batch; the grain is bounded (|langs|·buckets), so
    copy-on-write was CORRECT here — delta is simply cheaper per batch
    and this entry only ever reads the final state (a consumer needing
    an always-current state table mid-stream would prefer
    copy-on-write, the trade the harness docstring records)."""
    from flight_radar_pipeline_spark.streaming.ledger import (
        fold_chronological_waves_delta,
    )

    docs = load_table(spark, sf_dir, "documents")
    waves = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    def increment(batch: DataFrame) -> DataFrame:
        cnt = _nb_token_counts(batch).withColumn("kind", F.lit("tok"))
        cls = (
            batch.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("c"))
            .select("lang", F.lit(-1).cast("long").alias("bucket"), "c")
            .withColumn("kind", F.lit("doc"))
        )
        return cnt.unionByName(cls)

    def merge(old: DataFrame, new: DataFrame) -> DataFrame:
        return (
            old.unionByName(new)
            .groupBy("kind", "lang", "bucket")
            .agg(F.sum("c").alias("c"))
        )

    state = fold_chronological_waves_delta(
        spark, waves, increment, merge, prefix="nb_stream_"
    )
    grid = sorted(
        (r["lang"], int(r["c"]))
        for r in state.filter(F.col("kind") == "doc").collect()
    )
    langs, priors = _nb_priors(grid)
    cnt = state.filter(F.col("kind") == "tok").select("lang", "bucket", "c")
    weights = _nb_weights_pivoted(_nb_dense_from_counts(cnt), langs)
    return _nb_confusion(docs, langs, priors, weights)


# --------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit over corpus prefixes
# --------------------------------------------------------------------------

_HEAPS_CKPTS = 20
_HEAPS_K = 8  # char-shingle width — the MinHash sketch feature space


_HEAPS_ORACLE = rf"""
    with sz as (
        select cast(ceil((max(doc_id) + 1) / {_HEAPS_CKPTS}.0) as bigint) as st
        from documents
    ), dt as (
        select (doc_id // st) as bk,
               sum(greatest(len(text) - {_HEAPS_K - 1}, 1))::bigint as toks
        from documents, sz group by 1
    ), fo as (
        select min(doc_id) as fd from (
            select doc_id, substr(text, i, {_HEAPS_K}) as term
            from documents,
                 unnest(range(1, greatest(len(text) - {_HEAPS_K - 1}, 1) + 1))
                     as u(i)
        ) group by term
    ), vb as (
        select (fd // st) as bk, count(*)::bigint as nv
        from fo, sz group by 1
    ), cum as (
        select d.bk,
               sum(d.toks) over (order by d.bk) as n,
               sum(coalesce(v.nv, 0)) over (order by d.bk) as v
        from dt d left join vb v using (bk)
    ), xy as (
        select ln(n::double) as x, ln(v::double) as y, n, v from cum
    ), fit as (
        select count(*)::double as m, sum(x) as sx, sum(y) as sy,
               sum(x * x) as sxx, sum(y * y) as syy, sum(x * y) as sxy,
               max(n)::bigint as total_tokens, max(v)::bigint as vocab_size
        from xy
    )
    select cast(m as bigint) as n_checkpoints, total_tokens, vocab_size,
           round((m * sxy - sx * sy) / (m * sxx - sx * sx), 4) as beta,
           round(exp((sy - sx * ((m * sxy - sx * sy) / (m * sxx - sx * sx)))
                     / m), 4) as k_coef,
           round(pow(m * sxy - sx * sy, 2)
                 / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 4) as r2
    from fit
"""


@register("corpus_heaps_fit", _HEAPS_ORACLE)
def corpus_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(N) ≈ K·N^β over ~{c} corpus prefixes →
    (n_checkpoints, total_tokens, vocab_size, beta, k_coef, r2):
    document-id order stands in for ingestion order; checkpoint k holds
    the cumulative shingle-instance count N and distinct-shingle
    vocabulary V of the first k id-buckets, and log-log OLS (the
    `corpus_zipf_fit` discipline) fits the growth law. The vocabulary
    unit is the char-{k} shingle — the SAME feature space the MinHash
    dedup sketch hashes — because the synthetic corpus's whitespace
    vocabulary is a closed 31-word set (V saturates at bucket 1;
    measured), while shingle space keeps growing like a real corpus's
    vocabulary. β drifting down between crawls flags near-dup /
    boilerplate injection (new text stops minting new shingles — the
    corpus-level face of `doc_ngram_novelty`); β near 1 flags
    dedup-starved random text.

    Scale posture: NO global row window — checkpoint buckets derive
    from doc_id by one division against a 1-row size aggregate, so both
    the per-bucket instance sums (doc grain, a length expression — the
    shingles are never exploded on this side) and the first-occurrence
    aggregate (vocabulary grain, min(doc_id) per shingle — map-side
    combinable) partition freely; the cumulative windows and the OLS
    run on the ~{c}-row checkpoint frame. Counts stay bigint-exact into
    the logs."""
    docs = load_table(spark, sf_dir, "documents")
    # 1-row span anchor (the user_value_twap class): the checkpoint step
    # folds in as a literal — a broadcast of the 1-row aggregate would be
    # a BroadcastNestedLoopJoin for a single constant
    st = int(
        docs.agg(
            F.ceil((F.max("doc_id") + 1) / float(_HEAPS_CKPTS))
            .cast("long")
            .alias("st")
        ).collect()[0]["st"]
    )
    # same compact-side redistribution as the NB tokenizer: the ~|text|×
    # shingle fan-out must not inherit a one-file input's single task.
    # (Round-13 optimization pass: a row-local array_distinct before the
    # explode was tried — min(doc_id) per term is invariant to within-doc
    # duplicates — and measured: this corpus re-mints only 7% of shingles
    # within a document (1.45M → 1.35M rows at sf0.1), so the per-row
    # hash-set cost isn't paid back; left on the plain explode.)
    shingles = docs.repartition("doc_id").select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {_HEAPS_K - 1},"
                f" 1)), i -> substring(text, i, {_HEAPS_K}))"
            )
        ).alias("term"),
    )
    dt = (
        docs.select(
            "doc_id",
            F.greatest(F.length("text") - (_HEAPS_K - 1), F.lit(1))
            .cast("long")
            .alias("nt"),
        )
        .groupBy((F.col("doc_id") / F.lit(st)).cast("long").alias("bk"))
        .agg(F.sum("nt").alias("toks"))
    )
    fo = shingles.groupBy("term").agg(F.min("doc_id").alias("fd"))
    vb = (
        fo.groupBy((F.col("fd") / F.lit(st)).cast("long").alias("bk"))
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    w_cum = Window.orderBy("bk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        dt.join(vb, "bk", "left")
        .select(
            "bk",
            F.sum("toks").over(w_cum).alias("n"),
            F.sum(F.coalesce(F.col("nv"), F.lit(0))).over(w_cum).alias("v"),
        )
    )
    xy = cum.select(
        F.log(F.col("n").cast("double")).alias("x"),
        F.log(F.col("v").cast("double")).alias("y"),
        "n",
        "v",
    )
    m = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    sxy = F.sum(F.col("x") * F.col("y"))
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    return xy.agg(
        m.cast("bigint").alias("n_checkpoints"),
        F.max("n").cast("bigint").alias("total_tokens"),
        F.max("v").cast("bigint").alias("vocab_size"),
        F.round(beta, 4).alias("beta"),
        F.round(F.exp((sy - sx * beta) / m), 4).alias("k_coef"),
        F.round(
            F.pow(m * sxy - sx * sy, 2)
            / ((m * sxx - sx * sx) * (m * syy - sy * sy)),
            4,
        ).alias("r2"),
    )


corpus_heaps_fit.__doc__ = corpus_heaps_fit.__doc__.format(c=_HEAPS_CKPTS, k=_HEAPS_K)
