"""End-to-end training-corpus assembly runner.

The corpus-side counterpart of the medallion ``run_pipeline``: composes
the curation operators this engine provides into the standard assembly
line a pretraining-data pipeline runs —

    raw documents
      → language gate  (optional allowlist, pushdown-eligible)
      → quality gate   (heuristic score threshold, scan-speed)
      → exact dedup    (keep-min per canonical fingerprint)
      → near-dup gate  (MinHash-LSH pairs → components → keep cluster min)
      → decontamination (optional: n-gram overlap vs a held-out eval set)
      → chunking       (sliding token windows, row-local)
      → packing        (contiguous-fill to a token budget, per-bucket)
      → partitioned parquet write (one directory per pack bucket)

Every stage is a lazy DataFrame transform; per-stage row counts ride the
final write via ``observe`` (zero extra scans — see ``pipeline.metrics``).
The near-dup stage consumes a PAIRS DataFrame so callers can plug any
candidate generator (MinHash, SimHash, embedding-LSH) or pass the pair
table a previous run materialized; by default it runs MinHash-LSH with
the battery's parameters.

Scale posture mirrors the component operators: the corpus is shuffled
once for exact dedup (fingerprint key), once for packing (hash-bucket
windows); near-dup candidates stay bucket-joined; chunking never
shuffles. Nothing collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.functions import text as T
from flight_radar_pipeline_spark.operators import dedup as D
from flight_radar_pipeline_spark.operators.corpus_prep import (
    chunk_documents,
    contamination_report,
)
from flight_radar_pipeline_spark.operators.graph import connected_components
from flight_radar_pipeline_spark.operators.packing import pack_documents


@dataclass(frozen=True)
class CorpusResult:
    """The packed corpus plus per-stage row counts (metrics are only
    populated after an action has run on ``packed`` — the runner's write
    is that action when ``out_dir`` is given)."""

    packed: DataFrame
    metrics: dict[str, int]


def run_corpus_prep(
    docs: DataFrame,
    out_dir: str | None = None,
    quality_threshold: float = 0.5,
    langs: list[str] | None = None,
    lang_col: str = "lang",
    eval_docs: DataFrame | None = None,
    contamination_threshold: float = 0.2,
    near_dup_pairs: DataFrame | None = None,
    token_budget: int = 512,
    pack_buckets: int = 8,
    chunk_window: int = 32,
    chunk_stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> CorpusResult:
    """Assemble a packed training corpus from raw ``docs``; see module
    docstring for the stage chain. Returns the packed-chunk DataFrame
    (chunk rows carrying pack assignments) and, once written, per-stage
    counts."""
    # language gate — optional allowlist, pushdown-eligible predicate
    if langs is not None:
        docs = docs.filter(F.col(lang_col).isin(*langs))

    # quality gate — pure column exprs on the scan
    quality = docs.filter(
        T.quality_score(text_col) >= F.lit(quality_threshold)
    ).select(id_col, text_col)
    obs_q = Observation("quality_kept")
    quality = quality.observe(obs_q, F.count(F.lit(1)).alias("rows"))

    # exact dedup — keep-min per canonical fingerprint
    exact = D.dedup_exact(quality, text_col, id_col).drop("dup_count")
    obs_e = Observation("exact_kept")
    exact = exact.observe(obs_e, F.count(F.lit(1)).alias("rows"))

    # near-dup gate — pairs → components → keep each cluster's min id
    pairs = (
        near_dup_pairs
        if near_dup_pairs is not None
        else D.near_dup_pairs(exact, text_col, id_col)
    )
    losers = connected_components(pairs).filter(
        F.col("cluster_id") != F.col("doc_id")
    )
    kept = exact.join(
        losers.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )
    obs_k = Observation("near_dup_kept")
    kept = kept.observe(obs_k, F.count(F.lit(1)).alias("rows"))

    # decontamination gate — optional: drop docs whose distinct-n-gram
    # overlap with the held-out eval corpus exceeds the threshold (eval
    # grams broadcast; see operators.corpus_prep.contamination_report)
    if eval_docs is not None:
        contaminated = (
            contamination_report(kept, eval_docs, id_col=id_col, text_col=text_col)
            .filter(F.col("contamination") > F.lit(contamination_threshold))
            .select(F.col(id_col))
        )
        kept = kept.join(contaminated, id_col, "left_anti")
    obs_d = Observation("decontaminated_kept")
    kept = kept.observe(obs_d, F.count(F.lit(1)).alias("rows"))

    # chunk → pack (chunks become the packable units, keyed by a stable
    # synthetic chunk id folding doc and index)
    chunks = chunk_documents(
        kept, window=chunk_window, stride=chunk_stride,
        text_col=text_col, id_col=id_col,
    ).select(
        (F.col(id_col) * 1_000_000 + F.col("chunk_idx")).alias("chunk_id"),
        F.col(id_col).alias("src_doc_id"),
        "chunk_idx",
        F.col("n_chunk_tokens").alias("n_tokens"),
        "chunk_hash",
    )
    packed = pack_documents(
        chunks,
        token_budget=token_budget,
        buckets=pack_buckets,
        id_col="chunk_id",
        token_count_col="n_tokens",
    ).join(
        chunks.select("chunk_id", "src_doc_id", "chunk_idx", "chunk_hash"),
        "chunk_id",
    )
    obs_p = Observation("packed_chunks")
    packed = packed.observe(obs_p, F.count(F.lit(1)).alias("rows"))

    metrics: dict[str, int] = {}
    if out_dir is not None:
        (
            packed.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out_dir)
        )
        for name, obs in (
            ("quality_kept", obs_q),
            ("exact_kept", obs_e),
            ("near_dup_kept", obs_k),
            ("decontaminated_kept", obs_d),
            ("packed_chunks", obs_p),
        ):
            metrics[name] = int(obs.get["rows"])
    return CorpusResult(packed=packed, metrics=metrics)
