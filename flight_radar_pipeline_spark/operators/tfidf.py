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
