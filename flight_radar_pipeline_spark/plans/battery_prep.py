"""Corpus-assembly battery: decontamination, chunking, weighted sampling,
vocabulary/OOV profiling, domain-mixture sampling, length histograms —
the operators that turn a cleaned corpus into a training mix
(operators/corpus_prep.py).

Same contract as every battery: the Spark plan and a DuckDB oracle state
the identical deterministic computation; md5-derived randomness, total
orders on every ranking, doubles rounded in-plan on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T
from flight_radar_pipeline_spark.operators import corpus_prep as P
from flight_radar_pipeline_spark.plans.battery import register
from flight_radar_pipeline_spark.sources.readers import load_table


def _unit_hash_sql(key_expr: str, salt: str) -> str:
    """SQL twin of operators.corpus_prep.unit_hash: first 6 md5 nibbles,
    midpoint-shifted, scaled to (0, 1)."""
    return (
        f"((('0x' || substr(md5('{salt}-' || {key_expr}), 1, 6))::bigint + 0.5)"
        f" / 16777216.0)"
    )


# space-joined word trigrams of a token-array expression (matches
# functions.text.word_ngrams for n=3; empty below 3 tokens)
_TRIGRAMS_SQL = (
    "case when len(toks) >= 3 then "
    "[toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] "
    "for i in range(1, len(toks) - 1)] else [] end"
)


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------

_DECON_N = 3
_EVAL_BUCKET = 1  # hash_bucket(doc_id, 10) == 1 → the held-out ~10%

_DECON_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as toks,
               ('0x' || substr(md5(doc_id::varchar), 1, 12))::bigint % 10 as bucket
        from documents
    ), g as (
        select doc_id, bucket, unnest(list_distinct({_TRIGRAMS_SQL})) as gram
        from t
    ), eval_grams as (
        select distinct gram from g where bucket = {_EVAL_BUCKET}
    )
    select g.doc_id,
           count(*) as n_grams,
           count(e.gram) as n_overlap,
           round(count(e.gram) / count(*), 4) as contamination
    from g left join eval_grams e using (gram)
    where g.bucket != {_EVAL_BUCKET}
    group by g.doc_id
    order by g.doc_id
"""


@register("doc_decontamination", _DECON_ORACLE)
def doc_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-train-doc fraction of distinct word
    trigrams that appear in a deterministic held-out slice (md5 bucket 1,
    ~10%) — the flag-or-drop signal that keeps eval data out of a
    training corpus. Scale: eval grams broadcast, per-doc distinct grams
    computed row-locally (array_distinct before the explode), one
    uniform-key groupBy; the corpus never self-joins."""
    docs = load_table(spark, sf_dir, "documents")
    is_eval = T.hash_bucket("doc_id", 10) == _EVAL_BUCKET
    report = P.contamination_report(
        docs.filter(~is_eval), docs.filter(is_eval), n=_DECON_N
    )
    return report.orderBy("doc_id")


# --------------------------------------------------------------------------
# sliding-window chunking
# --------------------------------------------------------------------------

_CHUNK_W, _CHUNK_S = 32, 24

_CHUNK_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as toks
        from documents
    ), s as (
        select doc_id, toks,
               unnest(range(1, greatest(len(toks), 1) + 1, {_CHUNK_S})) as start
        from t
    )
    select doc_id,
           (start - 1) // {_CHUNK_S} as chunk_idx,
           start,
           least(len(toks) - start + 1, {_CHUNK_W})::bigint as n_chunk_tokens,
           md5(array_to_string(
               toks[start:least(start + {_CHUNK_W} - 1, len(toks))], ' '
           )) as chunk_hash
    from s
    order by doc_id, chunk_idx
"""


@register("doc_chunk_windows", _CHUNK_ORACLE)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (window 32, stride 24 → 8-token
    overlap) — the RAG/embedding-pipeline shape that splits documents
    into encoder-sized, overlapping pieces. Pure row-local explode+slice:
    no shuffle anywhere; chunk hashes support downstream chunk-level
    dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return P.chunk_documents(docs, window=_CHUNK_W, stride=_CHUNK_S).orderBy(
        "doc_id", "chunk_idx"
    )


# --------------------------------------------------------------------------
# weighted sampling (A-Res)
# --------------------------------------------------------------------------

_WS_M = 60

_WSAMPLE_ORACLE = rf"""
    with t as (
        select doc_id, lang,
               len(regexp_split_to_array(trim(text), '\s+')) as n_tokens
        from documents
    )
    select doc_id, lang, n_tokens,
           round(-ln({_unit_hash_sql("doc_id::varchar", "wsample")})
                 / n_tokens, 8) as sample_key
    from t
    order by sample_key, doc_id
    limit {_WS_M}
"""


@register("doc_weighted_sample", _WSAMPLE_ORACLE)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res,
    weight = token count): deterministic md5-derived draws, top-m by
    exponential key via TakeOrdered — per-partition heaps, no global
    sort. Longer documents win proportionally more slots — the
    length-weighted corpus subsetting shape."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.token_count("text").cast("bigint").alias("n_tokens")
    )
    return P.weighted_sample(docs, _WS_M, F.col("n_tokens")).select(
        "doc_id", "lang", "n_tokens", "sample_key"
    )


# --------------------------------------------------------------------------
# vocabulary coverage / OOV
# --------------------------------------------------------------------------

_VOCAB_V = 150

_OOV_ORACLE = rf"""
    with tok as (
        select doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) as token
        from documents
    ), vocab as (
        select token from tok
        group by token
        order by count(*) desc, token
        limit {_VOCAB_V}
    )
    select doc_id,
           count(*) as n_tokens,
           count(*) - count(v.token) as n_oov,
           round((count(*) - count(v.token)) / count(*), 4) as oov_rate
    from tok left join vocab v using (token)
    group by doc_id
    order by doc_id
"""


@register("doc_oov_rate", _OOV_ORACLE)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-150 token vocabulary (count-desc, token-asc total order) — the
    coverage check run before committing to a tokenizer/vocab. Scale:
    vocab is a TakeOrdered top-V then broadcast; the corpus side is one
    explode + one per-doc groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = P.top_vocabulary(docs, _VOCAB_V)
    return P.oov_report(docs, vocab).orderBy("doc_id")


# --------------------------------------------------------------------------
# domain-mixture sampling
# --------------------------------------------------------------------------

_MIX_SHARES = {"de": 0.15, "en": 0.35, "es": 0.20, "fr": 0.15, "zh": 0.15}
_MIX_BUDGET = 250

_MIX_CASE = " ".join(
    f"when '{dom}' then {share}" for dom, share in sorted(_MIX_SHARES.items())
)

_MIX_ORACLE = rf"""
    with c as (
        select lang, count(*) as n_docs from documents group by lang
    ), r as (
        select lang, n_docs,
               (case lang {_MIX_CASE} else 0.0 end) as target_share,
               round(least(1.0, (case lang {_MIX_CASE} else 0.0 end)
                                * {_MIX_BUDGET} / n_docs), 6) as rate
        from c
    )
    select d.lang, r.n_docs, r.target_share, r.rate,
           sum(case when {_unit_hash_sql("d.doc_id::varchar", "mix")} < r.rate
                    then 1 else 0 end)::bigint as n_sampled
    from documents d join r using (lang)
    group by d.lang, r.n_docs, r.target_share, r.rate
    order by d.lang
"""


@register("corpus_mixture_sample", _MIX_ORACLE)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture downsampling toward target language shares under a
    250-doc budget: per-domain rate = min(1, share·budget/n), membership
    by deterministic md5 draw → (lang, n_docs, target_share, rate,
    n_sampled). The mixture-weighting step of corpus assembly, auditable
    because the realized subset is rerun- and partition-invariant."""
    docs = load_table(spark, sf_dir, "documents")
    return P.mixture_sample_report(
        docs, _MIX_SHARES, _MIX_BUDGET, domain_col="lang"
    ).orderBy("lang")


# --------------------------------------------------------------------------
# token-length histogram
# --------------------------------------------------------------------------

_HIST_W = 16

_HIST_ORACLE = rf"""
    with t as (
        select len(regexp_split_to_array(trim(text), '\s+')) as n_tokens
        from documents
    )
    select (n_tokens // {_HIST_W}) * {_HIST_W} as bucket_lo,
           count(*) as n_docs,
           round(avg(n_tokens), 2) as avg_tokens
    from t
    group by bucket_lo
    order by bucket_lo
"""


@register("doc_length_histogram", _HIST_ORACLE)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width token-length histogram (bucket width 16) — the
    length-distribution profile that sets truncation/packing parameters
    for a training run. One partial-aggregated groupBy on a small key
    domain; scan-speed."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = T.token_count("text").cast("bigint")
    return (
        docs.select(
            (F.floor(ntok / _HIST_W) * _HIST_W).cast("bigint").alias("bucket_lo"),
            ntok.alias("__n"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__n"), 2).alias("avg_tokens"),
        )
        .orderBy("bucket_lo")
    )

# --------------------------------------------------------------------------
# embedding dimension statistics
# --------------------------------------------------------------------------

_EMB_DIMS = 64

_DIMSTATS_ORACLE = f"""
    with c as (
        select unnest(embedding::DOUBLE[]) as x,
               unnest(range(0, len(embedding))) as dim
        from embeddings
    )
    select dim::bigint as dim,
           round(avg(x), 6) as mean,
           round(stddev_pop(x), 6) as std
    from c group by dim order by dim
"""


@register("embedding_dim_stats", _DIMSTATS_ORACLE)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/stddev over the embedding corpus — the
    normalization/whitening statistics an ANN or PQ/OPQ pipeline computes
    before quantizer training. Shuffle-free shape: 64 paired aggregates
    over one corpus scan (each dimension a separate partial-aggregated
    column — no posexplode of corpus × dims rows), unpivoted to
    (dim, mean, std) AFTER the aggregate, when the frame is 1 row.
    The 128 aggregate expressions are built as TWO parsed SQL array
    literals (round-13, guide §1.3 — the linalg construction trick):
    the per-dimension Column loop paid ~5 py4j round-trips per
    aggregate of pure plan construction; the parsed expressions are
    identical, so the evaluated plan and every rounded value are
    unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(F.col("embedding").cast("array<double>").alias("__x"))
    means_sql = ", ".join(
        f"round(avg(__x[{d}]), 6)" for d in range(_EMB_DIMS)
    )
    stds_sql = ", ".join(
        f"round(stddev_pop(__x[{d}]), 6)" for d in range(_EMB_DIMS)
    )
    wide = x.agg(
        F.expr(f"array({means_sql})").alias("__m"),
        F.expr(f"array({stds_sql})").alias("__s"),
    )
    return (
        wide.select(F.posexplode("__m").alias("dim", "mean"), "__s")
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            "mean",
            F.element_at("__s", F.col("dim").cast("int") + 1).alias("std"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# vocabulary encoding (tokenize-and-numericalize)
# --------------------------------------------------------------------------

_ENCODE_ORACLE = rf"""
    with t as (
        select doc_id, regexp_split_to_array(trim(text), '\s+') as toks
        from documents
    ), occ as (
        select unnest(toks) as token from t
    ), counts as (
        select token, count(*) as c from occ group by token
    ), vocab as (
        select token, row_number() over (order by c desc, token) as id
        from counts order by c desc, token limit {_VOCAB_V}
    ), m as (
        select map(list(token order by id), list(id order by id)) as m
        from vocab
    )
    select doc_id,
           array_to_string(
               list_transform(toks, x -> coalesce(m[x][1], 0)::varchar), ' '
           ) as ids
    from t cross join m
    order by doc_id
"""


@register("doc_token_ids", _ENCODE_ORACLE)
def doc_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary encoding: every document's tokens numericalized against
    the corpus's own top-150 vocabulary (1-based frequency ranks, OOV→0)
    — the tokenize-and-numericalize step feeding a training run. The
    vocab folds into the scoring pass as a map literal, so encoding is a
    pure projection over the scan (no join, no shuffle, no Python); the
    oracle builds the same map in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = P.top_vocabulary(docs, _VOCAB_V)
    return P.vocab_encode(docs, vocab).orderBy("doc_id")


# --------------------------------------------------------------------------
# per-group embedding centroids
# --------------------------------------------------------------------------

@register(
    "embedding_group_centroids",
    """
    with c as (
        select label,
               unnest(embedding::DOUBLE[]) as x,
               unnest(range(0, len(embedding))) as dim
        from embeddings
    )
    select label, dim::bigint as dim,
           round(avg(x), 6) as mean_val
    from c group by label, dim order by label, dim
    """,
)
def embedding_group_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per class label — the class-prototype /
    nearest-centroid-classifier primitive (and the bulk step of any
    labeled-cluster refresh). Same shuffle-free-scan shape as
    ``embedding_dim_stats`` but grouped: 64 per-dimension ``avg``
    aggregates keyed by label, so the corpus is scanned once, partials
    combine map-side, and the shuffle carries only |labels| × 64 cells —
    never a posexplode of corpus × dims rows. Unpivot to (label, dim,
    mean_val) happens after the aggregate, at |labels| rows. The 64
    aggregates are built as ONE parsed SQL array literal (round-13,
    guide §1.3 — the same construction fix as ``embedding_dim_stats``);
    the parsed expressions are identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_dims = 64
    x = emb.select(
        "label", F.col("embedding").cast("array<double>").alias("__x")
    )
    means_sql = ", ".join(f"round(avg(__x[{d}]), 6)" for d in range(n_dims))
    wide = x.groupBy("label").agg(
        F.expr(f"array({means_sql})").alias("__m")
    )
    return (
        wide.select("label", F.posexplode("__m").alias("dim", "mean_val"))
        .select(
            "label", F.col("dim").cast("bigint").alias("dim"), "mean_val"
        )
        .orderBy("label", "dim")
    )


# --------------------------------------------------------------------------
# sampled pairwise-cosine histogram (threshold diagnostics)
# --------------------------------------------------------------------------

_CHIST_TARGET = 100   # FIXED expected sample size — modulus grows with n
_CHIST_W = 0.1        # histogram bin width over [-1, 1]

# the sampling modulus is SELF-SIZED: ceil(n / target) on both engines, so
# |S| (and the |S|² pair volume) stays constant as the corpus grows — a
# fixed RATE was the measured quadratic scale-killer (SCALE_RUN.json
# round 5: 8.7× wall at 10× data; fixed size: flat 0.54 s)
_CHIST_ORACLE = f"""
    with sizing as (
        -- integer ceil(n / target): float-free, so the modulus agrees
        -- with the Spark side bit-for-bit at any corpus count
        select greatest(1, (count(*) + {_CHIST_TARGET} - 1) // {_CHIST_TARGET})
                   as modulus
        from embeddings
    ), s as (
        select vec_id, embedding::DOUBLE[] as v,
               sqrt(list_inner_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) as nrm
        from embeddings cross join sizing
        where ('0x' || substr(md5('chist-' || vec_id::varchar), 1, 12))::bigint
              % modulus = 0
    ), pairs as (
        select round(
                 floor(list_inner_product(a.v, b.v) / (a.nrm * b.nrm)
                       / {_CHIST_W}) * {_CHIST_W}, 1) as bin_lo
        from s a join s b on a.vec_id < b.vec_id
    )
    select bin_lo, count(*) as n_pairs
    from pairs group by bin_lo order by bin_lo
"""


@register("embedding_cosine_histogram", _CHIST_ORACLE)
def embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of pairwise cosines over a deterministic hash-sample
    of the corpus — the diagnostic a dedup pipeline reads to SET its
    similarity threshold (where does the near-dup mode separate from the
    random-pair bulk?). The quadratic pair set is confined to the
    SAMPLE, and the sample SIZE is fixed: the md5-bucket modulus
    (engine- and partition-stable, the ``hash_bucket`` primitive) is
    derived as ceil(n / target) from the corpus count on BOTH engines,
    so |S| ≈ target no matter how big the corpus — diagnostics need a
    few million pairs, not the corpus product. Measured (SCALE_RUN.json
    round 5): fixed rate at 10× corpus → 8.7× wall (pairs ∝ n²); fixed
    size (modulus grown 10×) → 0.54 s, flat. S stays broadcast-sized
    and the pair join is one broadcast self-join. Histogram bins are
    floor-quantized before rounding so bin edges agree bit-for-bit
    across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    from flight_radar_pipeline_spark.functions.text import hash_bucket

    modulus = max(1, -(-emb.count() // _CHIST_TARGET))  # ceil(n / target)
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    s = emb.filter(
        hash_bucket(F.concat(F.lit("chist-"), F.col("vec_id")), modulus) == 0
    ).select("vec_id", v.alias("v"), nrm.alias("nrm"))
    a = s.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = s.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            F.round(
                F.floor(cos / _CHIST_W) * _CHIST_W, 1
            ).alias("bin_lo")
        )
        .groupBy("bin_lo")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("bin_lo")
    )
