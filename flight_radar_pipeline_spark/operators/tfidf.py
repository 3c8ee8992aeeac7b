"""TF-IDF term scoring over a document corpus.

The classic lexical relevance/keyword-extraction primitive a corpus
pipeline runs alongside dedup and quality scoring (topic labeling,
keyword-stuffing detection, cheap retrieval features). Entirely
relational — explode, two hash aggregates, a term-keyed join, a per-doc
top-k window — so Catalyst keeps every stage partial-aggregated and
codegen'd; no UDFs, exact SQL oracle.

Scale: the wide intermediate is (doc, term) pairs — one shuffle with full
map-side combine; the document-frequency join is keyed on term (cost
follows vocabulary size, never corpus²); the corpus size N joins as a
1-row broadcast. Scores are rounded before ranking so top-k membership is
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions.text import tokens


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    decimals: int = 4,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document → (id, term, tfidf, rank).

    tf = occurrences of the term in the document (whitespace tokens);
    idf = ln(N / df) with df = number of documents containing the term;
    score = round(tf · idf, decimals); ranking (score desc, term asc) is
    a total order, so the top-k set is deterministic.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("ndocs"))
    n = df.agg(F.count(F.lit(1)).alias("__N"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("__N").cast("double") / F.col("ndocs").cast("double")),
                decimals,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", F.col("rank").cast("bigint").alias("rank"))
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    decimals: int = 4,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms → (id, score), score > 0 (documents containing none of the
    terms drop out — at corpus scale you never materialize zero scores).

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1) — the standard
    lexical retrieval scorer (and the classic hybrid-search complement to
    the embedding ANN operators).

    Scale: token explode filters to the query terms IMMEDIATELY (the
    per-doc surviving stream is |q|-bounded), document lengths are one
    grouped count over the same scan, corpus stats (N, avgdl) a 1-row
    broadcast, per-term df a |q|-row broadcast. One doc-keyed sum at the
    end; everything partial-aggregated. Scores rounded for
    engine-portable ranking.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    qlit = F.array(*[F.lit(t) for t in query_terms])
    hits = toks.filter(F.array_contains(qlit, F.col("term")))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("ndocs"))
    dlen = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("double").alias("dl")
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("__N"),
        F.avg(F.size(tokens(text_col)).cast("double")).alias("__avgdl"),
    )
    idf = F.log(
        (F.col("__N") - F.col("ndocs") + 0.5) / (F.col("ndocs") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dlen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), decimals).alias("score"))
        .filter(F.col("score") > 0)
    )
