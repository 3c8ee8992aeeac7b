"""Corpus-trained bigram language-model scoring (perplexity filtering).

The standard model-based quality signal for training-data curation
(CCNet-style: score every document by an n-gram LM; filter or bucket on
perplexity) expressed entirely relationally — the "model" IS a pair of
count tables, training IS two hash aggregates over the corpus, and
scoring IS a join back against those tables. No Python in the loop, no
model artifact to ship: the whole thing is one Spark job.

Semantics (add-alpha smoothed bigram LM, trained on the scored corpus):

    P(w2 | w1) = (c(w1,w2) + alpha) / (c(w1,*) + alpha * V)

where ``c(w1,w2)`` counts bigram occurrences corpus-wide, ``c(w1,*)``
counts occurrences of ``w1`` as a bigram head, and ``V`` is the distinct
token count. A document's score is the mean negative log-probability of
its bigrams (= log-perplexity); high avg_nll → out-of-distribution or
degenerate text.

Scale posture: the bigram-instance explode is row-local; training is two
groupBys with full map-side partial aggregation (keys: bigram, unigram);
scoring re-joins instances to the bigram table on its natural key — the
one genuinely large shuffle, sized by distinct-bigram cardinality, which
Zipf keeps far below instance count. The unigram table and the 1-row
vocab count broadcast. No driver actions, no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T


def bigram_instances(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per adjacent token pair: (id, w1, w2). Documents with
    fewer than 2 tokens emit nothing. Tokens are materialized as a
    column BEFORE the pair lambda (HOF re-evaluation trap — see
    ``functions.text.word_ngrams``)."""
    toks = docs.select(
        F.col(id_col), T.tokens(text_col).alias("__toks")
    ).filter(F.size("__toks") >= 2)
    pair = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - 2),
        lambda i: F.struct(
            F.col("__toks")[i].alias("w1"), F.col("__toks")[i + 1].alias("w2")
        ),
    )
    return toks.select(
        id_col, F.explode(pair).alias("__b")
    ).select(id_col, "__b.w1", "__b.w2")


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    decimals: int = 4,
) -> DataFrame:
    """Score every document by the corpus-trained smoothed bigram LM →
    (id, n_bigrams, avg_nll) with ``avg_nll`` = mean −ln P(w2|w1),
    rounded in-plan. Deterministic: counts are exact, the smoothing
    arithmetic is pure, and rounding absorbs aggregation-order float
    noise."""
    bg = bigram_instances(docs, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    vocab = (
        docs.select(F.explode(T.tokens(text_col)).alias("__w"))
        .agg(F.count_distinct("__w").alias("__v"))
    )
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__nll",
            -F.log(
                (F.col("__c2") + F.lit(alpha))
                / (F.col("__c1") + F.lit(alpha) * F.col("__v"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__nll"), decimals).alias("avg_nll"),
    )
