"""Round-13 battery additions — two corpus/model-eval families the
registry genuinely lacks (pre-registration sweep per the standing
dedup-honesty rule: `grep @register` names + family keywords):

- Per-document duplicated-text COVERAGE: how much of EACH document is
  text that also appears (as an exact 8-token span) in at least one
  OTHER document — the doc-grain decision input of suffix-array-style
  exact-substring dedup (Lee et al.'s "Deduplicating Training Data",
  the pass that decides strip-the-span vs drop-the-doc).
  `doc_boilerplate_spans` owns the SPAN-grain view (which spans are
  boilerplate); nothing owns the doc-grain coverage, and the device is
  different: positional span occurrences + per-doc INTERVAL UNION via
  a cumulative-max window (the sweep-line union, not a count).
- NB margin calibration: the reliability table of the round-12
  in-engine Naive Bayes model — exact-integer top1−top2 margin, binned,
  with per-bin accuracy. This is the router's operating table (below
  which margin do you stop trusting the cheap classifier), i.e. the
  EVALUATION face of the trainer family. `event_score_isotonic_fit`
  owns score→probability calibration by PAVA on a given score column;
  this entry SCORES a model the engine itself trained and stays in
  exact integer micro-nats end to end (no float monotone fit at all).
- Exact NB model UNLEARNING: subtract an erased shard's integer count
  partials from the trained model and prove the result ≡ retraining on
  the remainder (the oracle retrains; the plan only subtracts). The
  GDPR right-to-be-forgotten face of the trainer family —
  `user_erasure_audit` purges DATA state; nothing addressed derived
  MODEL state, and the device (count-space subtraction; weight-space
  subtraction is impossible under Laplace smoothing) is the additive
  family's inverse contract with its own failure modes.
- Incremental span-index maintenance (`doc_coverage_stream_index`):
  the coverage entry's stream twin — per-batch span → (min id, max id)
  partials fold via the delta harness (min/max merge exactly, so the
  cross-document verdict is batch-split-invariant), and the final
  coverage equals the batch entry via the SHARED oracle. The
  incremental-crawl-dedup pattern at the span grain;
  `incremental_exact_dedup` owns the whole-document fingerprint
  version.

Candidates DROPPED by the sweep before registration: count-min-sketch
heavy hitters (`event_cms_estimates` owns the CMS device and
`doc_heavy_hitters` the exact Misra–Gries pass), NB AUC (the
Mann–Whitney U entry owns the rank-sum device; one-vs-rest AUC is U
rescaled), federated/sharded OLS merge (`event_value_stats_merged`
owns the mergeable-sufficient-statistics family — X'X/X'y partials are
the same device with more sums), and a dedup threshold-sensitivity
curve (`embedding_cosine_histogram` + the recall-eval entries already
state the score distribution and its consequences).

Registered into the shared REGISTRY on import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.plans.battery import (
    register,
    register_grid_plans,
)
from flight_radar_pipeline_spark.plans.battery_r12 import (
    _nb_class_grid,
    _nb_confusion,
    _nb_dense_from_counts,
    _nb_priors,
    _nb_token_counts,
    _nb_weights_pivoted,
    _tok,
)
from flight_radar_pipeline_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# per-document duplicated-text coverage (exact 8-token spans, interval union)
# --------------------------------------------------------------------------

_DUP_K = 8  # span width in tokens — the boilerplate entry's grain

_COVERAGE_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as ts
        from documents
    ), occ as (
        select doc_id, i as start_pos, i + {_DUP_K} as end_pos,
               array_to_string(ts[i:i + {_DUP_K} - 1], ' ') as span
        from t, unnest(range(1, len(ts) - {_DUP_K} + 2)) as u(i)
        where len(ts) >= {_DUP_K}
    ), dup as (
        select span from occ
        group by span having min(doc_id) <> max(doc_id)
    ), iv as (
        select o.doc_id, o.start_pos, o.end_pos
        from occ o join dup using (span)
    ), mrg as (
        select doc_id, start_pos, end_pos,
               max(end_pos) over (
                   partition by doc_id order by start_pos
                   rows between unbounded preceding and 1 preceding
               ) as pe
        from iv
    ), cov as (
        select doc_id,
               sum(greatest(0, end_pos
                               - greatest(start_pos,
                                          coalesce(pe, start_pos))))::bigint
                   as dup_tokens
        from mrg group by doc_id
    )
    select t.doc_id, len(t.ts)::bigint as n_tokens,
           coalesce(c.dup_tokens, 0)::bigint as dup_tokens,
           round(coalesce(c.dup_tokens, 0) / len(t.ts), 4) as coverage
    from t left join cov c using (doc_id)
    order by t.doc_id
"""


@register("doc_duplicated_coverage", _COVERAGE_ORACLE)
def doc_duplicated_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text coverage → (doc_id, n_tokens,
    dup_tokens, coverage): every exact {k}-token span that occurs in ≥2
    DISTINCT documents marks its positions duplicated, overlapping
    marks merge (interval union), and coverage = duplicated tokens /
    total tokens. This is the doc-grain decision input of
    exact-substring dedup: coverage ≈ 1 → drop the document, moderate →
    strip the spans, ≈ 0 → keep (the pass suffix-array dedup pipelines
    run after span mining; the span-grain counts themselves live in
    `doc_boilerplate_spans`).

    Device: positional span stream (one span per token — corpus-linear
    fan-out) → ONE span-keyed aggregate where `min(doc_id) <>
    max(doc_id)` detects cross-document duplication WITHOUT a
    count-distinct expansion → positions join back on span → per-doc
    interval union as a cumulative-max window (contribution =
    `end − max(start, running max of prior ends)`, the sweep-line union
    — no pairwise overlap join exists). Intra-document repeats alone do
    NOT count (the contract is "appears elsewhere in the corpus").

    Scale: the span aggregate combines map-side (one row per distinct
    span on the shuffle); the positional relation feeds the aggregate
    and the join, so it persists (MEMORY_AND_DISK — at 100 TB prefer
    recomputing the explode over caching a corpus-sized relation: the
    operator's ``spans_storage=None`` knob). The window
    partitions by doc_id — per-doc row counts are bounded by token
    counts, no global window. Span keys stay plain text so the oracle
    is exactly relational; at 100 TB the group key would be
    `xxhash64(span)` (8-byte shuffle keys, identical semantics) — the
    `doc_boilerplate_spans` note applies verbatim."""
    from flight_radar_pipeline_spark.operators.dedup import (
        duplicated_span_coverage,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_coverage(
        docs, "text", "doc_id", k=_DUP_K
    ).orderBy("doc_id")


doc_duplicated_coverage.__doc__ = doc_duplicated_coverage.__doc__.format(
    k=_DUP_K
)


# --------------------------------------------------------------------------
# NB margin calibration (reliability table of the in-engine trainer)
# --------------------------------------------------------------------------

_MARGIN_BIN_W = 200_000  # micro-nats per bin (0.2 nats)
_MARGIN_NBINS = 10

_CALIB_ORACLE = f"""
    with tok as (
        select doc_id,
               ('0x' || substr(md5(unnest(
                   regexp_split_to_array(trim(text), '\\s+'))), 1, 6))::bigint
                 % 64 as bucket
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
               round(ln((coalesce(c.c, 0) + 1) / (t.tot + 64.0))
                     * 1e6)::bigint as wint
        from (select distinct lang from documents) l
        cross join (select unnest(range(0, 64)) as bucket) b
        join tots t on t.lang = l.lang
        left join cnt c on c.lang = l.lang and c.bucket = b.bucket
    ), sums as (
        select t.doc_id, w.lang, sum(w.wint)::bigint as s
        from tok t join w using (bucket)
        group by 1, 2
    ), ranked as (
        select s.doc_id, s.lang, p.prior + s.s as score,
               row_number() over (
                   partition by s.doc_id
                   order by p.prior + s.s desc, s.lang
               ) as rn
        from sums s join pri p using (lang)
    ), margins as (
        select r1.doc_id, r1.lang as pred_lang,
               r1.score - r2.score as margin
        from ranked r1 join ranked r2
          on r1.doc_id = r2.doc_id and r1.rn = 1 and r2.rn = 2
    )
    select least(m.margin // {_MARGIN_BIN_W}, {_MARGIN_NBINS - 1})
               as margin_bin,
           count(*)::bigint as n_docs,
           sum(case when m.pred_lang = d.lang then 1 else 0 end)::bigint
               as n_correct,
           round(sum(case when m.pred_lang = d.lang then 1 else 0 end)
                 / count(*), 4) as accuracy
    from margins m join documents d using (doc_id)
    group by 1 order by 1
"""


@register_grid_plans("doc_nb_margin_calibration")
def _calib_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # same bounded build-time collect as the classifier: langs + priors
    docs = load_table(spark, sf_dir, "documents")
    return {
        "class_grid": _nb_class_grid(spark, sf_dir),
        "weights": _nb_dense_from_counts(_nb_token_counts(docs)),
    }


@register("doc_nb_margin_calibration", _CALIB_ORACLE)
def doc_nb_margin_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the in-engine NB language classifier →
    (margin_bin, n_docs, n_correct, accuracy): per document, the
    top1 − top2 score margin in EXACT integer micro-nats, binned at
    0.2-nat width (top bin open-ended), with per-bin accuracy against
    the true label. This is the router's operating curve — pick the
    margin below which documents escalate past the cheap model — and
    the evaluation face of the trainer family: a well-calibrated model
    shows accuracy rising monotonically with margin.

    Parity discipline: scores, margins, and bins are integers end to
    end (the round-12 micro-nat contract), so no float summation or
    exp/log evaluation order exists to disagree with the oracle; the
    argmax and the runner-up tiebreak are (score desc, lang asc) in
    both, expressed here as an ascending sort of (−score, lang index)
    structs. Scale: training is the same one map-side-combinable
    aggregate as `doc_nb_lang_classifier` (shared helpers); scoring is
    one token-explode scan against the BROADCAST pivoted weights; the
    margin sort is a |langs|-element array sort per document (row-local,
    no window); the output is ≤{nb} rows. Only driver action: the
    bounded |langs|-row prior collect (subplans in GRID_PLANS)."""
    docs = load_table(spark, sf_dir, "documents")
    grid = sorted(
        (r["lang"], int(r["n_docs"]))
        for r in _nb_class_grid(spark, sf_dir).collect()
    )
    langs, priors = _nb_priors(grid)
    weights = _nb_weights_pivoted(
        _nb_dense_from_counts(_nb_token_counts(docs)), langs
    )
    sums = (
        _tok(docs)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", F.col("lang").alias("true_lang"))
        .agg(*[F.sum(f"w_{i}").alias(f"s_{i}") for i in range(len(langs))])
    )
    # ascending sort of (−score, index) structs ≡ (score desc, lang asc):
    # element 1 is the argmax, element 2 the runner-up — both exact ints
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-(F.lit(priors[lang]).cast("long") + F.col(f"s_{i}"))).alias(
                        "ns"
                    ),
                    F.lit(i).alias("idx"),
                )
                for i, lang in enumerate(langs)
            ]
        )
    )
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    scored = sums.select(
        "true_lang",
        F.element_at(
            lang_arr, (F.element_at(ranked, 1)["idx"] + 1).cast("int")
        ).alias("pred_lang"),
        (
            F.element_at(ranked, 2)["ns"] - F.element_at(ranked, 1)["ns"]
        ).alias("margin"),
    )
    return (
        scored.select(
            F.least(
                F.floor(F.col("margin") / _MARGIN_BIN_W),
                F.lit(_MARGIN_NBINS - 1),
            )
            .cast("bigint")
            .alias("margin_bin"),
            (F.col("pred_lang") == F.col("true_lang")).cast("int").alias(
                "__ok"
            ),
        )
        .groupBy("margin_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__ok").cast("bigint").alias("n_correct"),
            F.round(F.sum("__ok") / F.count(F.lit(1)), 4).alias("accuracy"),
        )
        .orderBy("margin_bin")
    )


doc_nb_margin_calibration.__doc__ = doc_nb_margin_calibration.__doc__.format(
    nb=_MARGIN_NBINS
)


# --------------------------------------------------------------------------
# exact NB model unlearning (count-space subtraction ≡ retrain)
# --------------------------------------------------------------------------

_UNLEARN_MOD = 7  # erased set: doc_id % 7 == 0 (deterministic)

_UNLEARN_ORACLE = f"""
    with kept as (
        select * from documents where doc_id % {_UNLEARN_MOD} <> 0
    ), tok as (
        select doc_id,
               ('0x' || substr(md5(unnest(
                   regexp_split_to_array(trim(text), '\\s+'))), 1, 6))::bigint
                 % 64 as bucket
        from kept
    ), pri as (
        select lang,
               round(ln(count(*) / (select count(*)::double from kept))
                     * 1e6)::bigint as prior
        from kept group by lang
    ), cnt as (
        select d.lang, t.bucket, count(*) as c
        from tok t join kept d using (doc_id)
        group by 1, 2
    ), tots as (
        select lang, sum(c) as tot from cnt group by lang
    ), w as (
        select l.lang, b.bucket,
               round(ln((coalesce(c.c, 0) + 1) / (t.tot + 64.0))
                     * 1e6)::bigint as wint
        from (select distinct lang from kept) l
        cross join (select unnest(range(0, 64)) as bucket) b
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
    from kept d join pred p using (doc_id)
    group by 1, 2
    order by 1, 2
"""


@register_grid_plans("doc_nb_unlearn_erasure")
def _unlearn_grid_plans(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    # the build-time bounded collect is the SUBTRACTED class grid
    # (langs + remaining doc counts); `counts_delta` is the unlearned
    # count table the final plan's weights derive from
    docs = load_table(spark, sf_dir, "documents")
    erased = docs.filter(F.col("doc_id") % _UNLEARN_MOD == 0)
    return {
        "class_grid": _unlearn_class_grid(docs, erased),
        "counts_delta": _unlearn_counts(docs, erased),
    }


def _unlearn_class_grid(docs: DataFrame, erased: DataFrame) -> DataFrame:
    full = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_full"))
    gone = erased.groupBy("lang").agg(F.count(F.lit(1)).alias("n_gone"))
    return (
        full.join(gone, "lang", "left")
        .select(
            "lang",
            (
                F.col("n_full") - F.coalesce(F.col("n_gone"), F.lit(0))
            ).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 0)
    )


def _unlearn_counts(docs: DataFrame, erased: DataFrame) -> DataFrame:
    full = _nb_token_counts(docs)
    gone = _nb_token_counts(erased).withColumnRenamed("c", "c_gone")
    return (
        full.join(gone, ["lang", "bucket"], "left")
        .select(
            "lang",
            "bucket",
            (F.col("c") - F.coalesce(F.col("c_gone"), F.lit(0))).alias("c"),
        )
        .filter(F.col("c") > 0)
    )


@register("doc_nb_unlearn_erasure", _UNLEARN_ORACLE)
def doc_nb_unlearn_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact machine unlearning for the in-engine NB model → the
    confusion grid of the UNLEARNED model over the remaining corpus,
    provably equal to retraining from scratch (which is what the oracle
    does — it retrains on `doc_id % {m} <> 0` directly, while this plan
    never trains on the remaining set: it SUBTRACTS the erased shard's
    integer partials from the full model's). The trainer family's
    right-to-be-forgotten face, beside `user_erasure_audit`'s data-state
    purge: a GDPR erasure must also leave derived MODEL state as if the
    data had never been seen, and for additive-sufficient-statistics
    models that is a count-space subtraction — one pass over the ERASED
    shard, never a corpus rescan.

    The insight the oracle pins: unlearning CANNOT happen in weight
    space. Laplace-smoothed log-likelihoods are a nonlinear function of
    the counts (log((c+1)/(tot+B))), so subtracting weight deltas is
    wrong; only the (lang, bucket) integer count grid is additive, and
    weights/priors must re-derive from the subtracted counts. Zero-count
    rows drop after subtraction so the count relation is exactly the
    retrain relation (the smoothing then treats them identically via
    the dense grid's coalesce).

    Scale: two map-side-combinable fact aggregates (full + erased — in
    a deployment the full grid is the maintained model state, e.g. the
    `doc_nb_stream_train` fold, and only the erased shard is scanned);
    the subtraction is a |langs|×64-bounded join; scoring is the same
    broadcast-weights scan as the classifier, over the remaining
    corpus. Only driver action: the bounded |langs|-row subtracted
    class grid (subplans in GRID_PLANS)."""
    docs = load_table(spark, sf_dir, "documents")
    erased = docs.filter(F.col("doc_id") % _UNLEARN_MOD == 0)
    kept = docs.filter(F.col("doc_id") % _UNLEARN_MOD != 0)
    grid = sorted(
        (r["lang"], int(r["n_docs"]))
        for r in _unlearn_class_grid(docs, erased).collect()
    )
    langs, priors = _nb_priors(grid)
    weights = _nb_weights_pivoted(
        _nb_dense_from_counts(_unlearn_counts(docs, erased)), langs
    )
    return _nb_confusion(kept, langs, priors, weights)


doc_nb_unlearn_erasure.__doc__ = doc_nb_unlearn_erasure.__doc__.format(
    m=_UNLEARN_MOD
)


# --------------------------------------------------------------------------
# incremental span-index maintenance (the coverage entry's stream twin)
# --------------------------------------------------------------------------


@register("doc_coverage_stream_index", _COVERAGE_ORACLE)
def doc_coverage_stream_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the exact-substring dedup INDEX — the
    stream twin of `doc_duplicated_coverage`, extending the
    maintained-state family to the dedup-index class: documents arrive
    in 3 microbatches and a delta fold (`streaming.ledger.
    fold_chronological_waves_delta`) appends each batch's
    span → (min doc_id, max doc_id) partial; min/max are MERGEABLE, so
    the merged index's cross-document verdict (`min <> max`) is exact
    for ANY batch split — a span's (lo, hi) envelope only widens as
    batches land, never needs history re-scanned. After the stream
    drains, the full corpus scores its positions against the MAINTAINED
    index (`duplicated_span_coverage(dup_spans=...)`) and the coverage
    table must equal the batch entry's, which is what the shared oracle
    states verbatim.

    This is the incremental-crawl-dedup pattern: a 100 TB feed folds
    each arriving batch's span partials in O(batch), the index grain
    grows with the DISTINCT-span universe (the delta fold's design
    case, like the W₁ ledger — the growing grain is exactly why
    copy-on-write would re-write O(index) per batch), and per-batch
    coverage decisions can consult the always-merged verdict without
    ever revisiting old documents. `incremental_exact_dedup` owns the
    whole-document fingerprint version of this contract; the span grain
    is what catches partial copies."""
    from flight_radar_pipeline_spark.operators.dedup import (
        duplicated_span_coverage,
        positional_token_spans,
    )
    from flight_radar_pipeline_spark.streaming.ledger import (
        fold_chronological_waves_delta,
    )

    docs = load_table(spark, sf_dir, "documents")
    waves = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    def increment(batch: DataFrame) -> DataFrame:
        return (
            positional_token_spans(batch, "text", "doc_id", k=_DUP_K)
            .groupBy("__span")
            .agg(
                F.min("doc_id").alias("__lo"),
                F.max("doc_id").alias("__hi"),
            )
        )

    def merge(old: DataFrame, new: DataFrame) -> DataFrame:
        return (
            old.unionByName(new)
            .groupBy("__span")
            .agg(F.min("__lo").alias("__lo"), F.max("__hi").alias("__hi"))
        )

    state = fold_chronological_waves_delta(
        spark, waves, increment, merge, prefix="cov_index_"
    )
    dup = state.filter(F.col("__lo") != F.col("__hi")).select("__span")
    return duplicated_span_coverage(
        docs, "text", "doc_id", k=_DUP_K, dup_spans=dup
    ).orderBy("doc_id")
