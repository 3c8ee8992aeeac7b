"""Corpus-preparation operators a training-data pipeline runs between
cleaning and training: decontamination against a held-out set, document
chunking, weighted sampling, vocabulary/OOV profiling, and domain-mixture
sampling.

Like the dedup/similarity families, every operator here is deterministic
and engine-portable: pseudo-randomness is md5-derived (partition- and
rerun-invariant), ranked outputs carry total orders, doubles are rounded
in-plan — so each has an exact DuckDB oracle in
``plans/battery_prep.py``.

Scale posture (100 TB corpus, small eval/vocab/dimension sides):

- decontamination broadcasts the EVAL gram set (held-out benchmarks are
  MBs, the corpus is TBs) — the corpus side is one scan + one groupBy;
- chunking is a pure row-local explode (no shuffle at all);
- weighted sampling is a TakeOrdered top-m (per-partition heaps + one
  m-row merge on the driver — no global sort);
- OOV profiling broadcasts the top-V vocabulary;
- mixture sampling computes per-domain rates from a dimension-sized
  count table and broadcasts them back over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def unit_hash(key: Column | str, salt: str) -> Column:
    """Deterministic uniform double in (0, 1) from md5(salt || '-' || key):
    the first 6 hex nibbles (24 bits) as an integer, midpoint-shifted and
    scaled by 16^6. The same value is derivable in any SQL dialect (CASE
    cascade per nibble), which is what makes sampling decisions auditable
    and rerun-stable — ``rand(seed)`` is partition-layout-dependent."""
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}-"), _col(key).cast("string"))), 1, 6),
        16,
        10,
    ).cast("double")
    return (v + 0.5) / F.lit(float(16**6))


def contamination_report(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 4,
) -> DataFrame:
    """Per-train-document n-gram contamination against a held-out set →
    (id, n_grams, n_overlap, contamination), contamination = fraction of
    the document's DISTINCT word n-grams that appear anywhere in the eval
    corpus — the standard benchmark-decontamination signal (filter or
    flag docs above a threshold before training).

    Scale: per-doc distinct grams come from ``array_distinct`` BEFORE the
    explode (row-local, no dedup shuffle); the eval gram universe is
    ``broadcast()`` (held-out benchmarks are tiny next to a 100 TB train
    corpus); the only shuffle is the final per-doc groupBy on a uniform
    key. Documents with fewer than ``n`` tokens have no grams and are
    absent from the report (nothing to contaminate).
    """
    grams = F.array_distinct(T.word_ngrams(T.tokens(text_col), n))
    tg = train.select(_col(id_col), F.explode(grams).alias("gram"))
    eg = (
        eval_docs.select(F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        tg.join(F.broadcast(eg), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_overlap"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_overlap") / F.col("n_grams"), decimals),
        )
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking → one row per (doc, chunk):
    (id, chunk_idx, start, n_chunk_tokens, chunk_hash). Chunk c covers
    tokens [1 + c·stride, 1 + c·stride + window) (1-based), so
    consecutive chunks overlap by ``window - stride`` tokens — the
    context-window packing shape RAG/embedding pipelines feed encoders.

    The trailing chunk is partial by design (every token lands in ≥ 1
    chunk; none are dropped). ``chunk_hash`` is the md5 of the
    space-joined chunk text — enough for downstream chunk-level dedup
    without materializing the text twice.

    Scale: pure row-local work — tokenize once per row (materialized as a
    column BEFORE the lambda, see ``word_ngrams`` for the HOF
    re-evaluation trap), explode a bounded start-position sequence, slice
    per start. No shuffle anywhere; output partitioning inherits the scan.
    """
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")
    df = docs.select(_col(id_col), T.tokens(text_col).alias("__toks"))
    df = df.select(
        id_col,
        "__toks",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(stride)
            )
        ).alias("__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), window)
    return df.select(
        id_col,
        (((F.col("__start") - 1) / stride).cast("bigint")).alias("chunk_idx"),
        F.col("__start").cast("bigint").alias("start"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def weighted_sample(
    docs: DataFrame,
    m: int,
    weight: Column,
    salt: str = "wsample",
    id_col: str = "doc_id",
    decimals: int = 8,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-Res):
    each row draws key = −ln(u)/w with u = ``unit_hash`` and w =
    ``weight``; the m SMALLEST keys win (equivalently the largest
    u^(1/w)). Inclusion probability is proportional to weight, the draw
    is deterministic (md5-derived u), and the selection is a single
    TakeOrdered top-m — per-partition heaps, no global sort, no shuffle
    of the corpus.

    Keys are rounded before ranking so the cross-engine ln() ulp
    difference cannot reorder the boundary; ties break on id. Returns the
    winning rows with their ``sample_key``.
    """
    keyed = docs.withColumn(
        "sample_key",
        F.round(-F.log(unit_hash(id_col, salt)) / weight.cast("double"), decimals),
    )
    return keyed.orderBy(F.asc("sample_key"), F.asc(id_col)).limit(m)


def top_vocabulary(
    docs: DataFrame,
    size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ``size`` most frequent whitespace tokens → (token, n_occ),
    ties broken token-asc so the vocabulary is a deterministic function
    of the corpus. One explode + one groupBy + a TakeOrdered top-V —
    the standard tokenizer-training precursor."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("token"))
        .limit(size)
    )


def oov_report(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    decimals: int = 4,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against ``vocab`` (a (token, …)
    frame, e.g. ``top_vocabulary``) → (id, n_tokens, n_oov, oov_rate) over
    token OCCURRENCES — the coverage metric that decides whether a
    tokenizer/vocab fits a corpus. Scale: vocab is broadcast (top-V is
    KBs); one explode + one per-doc groupBy."""
    tok = docs.select(_col(id_col), F.explode(T.tokens(text_col)).alias("token"))
    v = vocab.select("token").withColumn("__v", F.lit(1))
    return (
        tok.join(F.broadcast(v), "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.count(F.lit(1)) - F.count("__v")).alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.round(F.col("n_oov") / F.col("n_tokens"), decimals)
        )
    )


def mixture_sample_report(
    docs: DataFrame,
    target_shares: dict[str, float],
    budget: int,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    rate_decimals: int = 6,
) -> DataFrame:
    """Domain-mixture downsampling: given target corpus shares per domain
    and a total document budget, compute each domain's deterministic
    sampling rate ``min(1, share·budget / n_domain)`` and count the
    documents whose ``unit_hash`` falls under it →
    (domain, n_docs, target_share, rate, n_sampled).

    This is the mixture-weighting step of corpus assembly (up-/down-
    weighting sources toward a target distribution); the hash-rate
    selection makes the realized subset rerun- and partition-invariant,
    so the mix is auditable. Domains absent from ``target_shares`` get
    rate 0 (excluded from the mix, still reported).

    Scale: pass 1 is a domain-count aggregation (dimension-sized result);
    rates derive from it row-locally and broadcast back over the corpus
    for pass 2's conditional count. Two scans, no corpus-sized shuffle
    beyond the two domain-keyed aggs (domains are few; at real scale the
    agg is partial-combined so skew in domain sizes does not funnel).
    """
    share = F.lit(None).cast("double")
    expr = None
    for dom, s in sorted(target_shares.items()):
        cond = _col(domain_col) == dom
        expr = F.when(cond, F.lit(float(s))) if expr is None else expr.when(
            cond, F.lit(float(s))
        )
    share = expr.otherwise(F.lit(0.0)) if expr is not None else F.lit(0.0)
    counts = docs.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    rates = counts.select(
        domain_col,
        "n_docs",
        share.alias("target_share"),
        F.round(
            F.least(F.lit(1.0), share * budget / F.col("n_docs")), rate_decimals
        ).alias("rate"),
    )
    u = unit_hash(id_col, salt)
    return (
        docs.select(_col(domain_col), u.alias("__u"))
        .join(F.broadcast(rates), domain_col)
        .groupBy(domain_col, "n_docs", "target_share", "rate")
        .agg(
            F.sum(F.when(F.col("__u") < F.col("rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled")
        )
    )


def vocab_encode(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Encode every document's tokens to vocabulary ids → (id, ids string)
    — the tokenize-and-numericalize step feeding a training run, with
    OOV → ``oov_id``. Ids are 1-based ranks of ``vocab``'s rows in its
    own (n_occ desc, token asc) order.

    Scale posture: the vocabulary is a bounded driver collect (top-V is
    KBs — the same class as building any broadcast/literal), folded into
    the scoring pass as a MAP LITERAL consumed by ``transform`` +
    ``element_at``. Scoring is therefore a pure projection over the
    corpus scan: no join, no shuffle, no Python — the explode-and-join
    alternative shuffles corpus × tokens rows for the same answer. Ids
    render as a space-joined string so the result hashes identically
    across engines.
    """
    rows = vocab.collect()
    terms = [r[0] for r in rows]
    if len(set(terms)) != len(terms):
        raise ValueError(
            "vocab_encode: vocabulary tokens must be unique "
            "(duplicate keys would hit create_map's duplicate-key policy)"
        )
    if "n_occ" in vocab.columns:
        # Re-derive the documented (n_occ desc, token asc) ranking here so
        # ids don't depend on the incoming frame's collect order.
        order = sorted(
            range(len(rows)), key=lambda i: (-rows[i]["n_occ"], terms[i])
        )
        terms = [terms[i] for i in order]
    kv: list[Column] = []
    for i, t in enumerate(terms):
        kv.extend([F.lit(t), F.lit(i + 1)])
    vmap = F.create_map(*kv)
    ids = F.transform(
        T.tokens(text_col),
        lambda t: F.coalesce(F.element_at(vmap, t), F.lit(oov_id)).cast("string"),
    )
    return docs.select(F.col(id_col), F.array_join(ids, " ").alias("ids"))
