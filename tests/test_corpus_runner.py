"""End-to-end corpus-assembly runner: stage invariants over real test
data, written output queryable, metrics consistent with the data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flight_radar_pipeline_spark.pipeline.corpus import run_corpus_prep
from flight_radar_pipeline_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus") / "packed")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    res = run_corpus_prep(docs, out_dir=out, token_budget=128, pack_buckets=4)
    return res, out, docs


def test_stage_metrics_monotone_and_consistent(result):
    res, _, docs = result
    m = res.metrics
    n_docs = docs.count()
    # each gate only removes rows; chunking can only expand kept docs
    assert n_docs >= m["quality_kept"] >= m["exact_kept"] >= m["near_dup_kept"] > 0
    assert m["packed_chunks"] >= m["near_dup_kept"]


def test_written_corpus_is_dedup_clean_and_packed(result, spark):
    res, out, _ = result
    packed = spark.read.parquet(out)
    assert packed.count() == res.metrics["packed_chunks"]
    # no surviving duplicate chunk assignment
    assert (
        packed.groupBy("chunk_id").count().filter(F.col("count") > 1).count() == 0
    )
    # contiguous packing: every (bucket, pack) except a bucket's last is
    # filled past budget only by its straddling tail chunk
    per_pack = packed.groupBy("bucket", "pack_id").agg(
        F.sum("n_tokens").alias("tok")
    )
    assert per_pack.count() > 0
    # pack ids embed their bucket
    bad = packed.filter(
        (F.col("pack_id") - F.col("bucket") * F.lit(2**32)) < 0
    ).count()
    assert bad == 0


def test_near_dup_losers_absent(result, spark):
    res, out, docs = result
    from flight_radar_pipeline_spark.operators import dedup as D
    from flight_radar_pipeline_spark.operators.graph import connected_components

    packed = spark.read.parquet(out)
    kept_docs = {r["src_doc_id"] for r in packed.select("src_doc_id").distinct().collect()}
    exact = D.dedup_exact(docs, "text", "doc_id").drop("dup_count")
    losers = {
        r["doc_id"]
        for r in connected_components(D.near_dup_pairs(exact, "text", "doc_id"))
        .filter(F.col("cluster_id") != F.col("doc_id"))
        .collect()
    }
    assert kept_docs.isdisjoint(losers)


def test_language_and_decontamination_gates(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    eval_docs = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    out = str(tmp_path / "packed_decon")
    res = run_corpus_prep(
        docs,
        out_dir=out,
        langs=["en", "es"],
        eval_docs=eval_docs,
        contamination_threshold=0.2,
        token_budget=128,
        pack_buckets=4,
    )
    m = res.metrics
    # the language gate ran before quality: nothing outside the allowlist
    # survives to the written output's source docs
    kept_docs = (
        spark.read.parquet(out)
        .select("src_doc_id")
        .distinct()
        .join(
            docs.select(F.col("doc_id").alias("src_doc_id"), "lang"),
            "src_doc_id",
        )
    )
    assert kept_docs.filter(~F.col("lang").isin("en", "es")).count() == 0
    # decontamination is a gate: it can only remove
    assert m["near_dup_kept"] >= m["decontaminated_kept"] > 0
    # eval-heavy docs (doc_id % 50 == 0 ARE the eval set -> contamination
    # 1.0) must be gone wherever they passed the earlier gates
    assert (
        spark.read.parquet(out)
        .filter((F.col("src_doc_id") % 50) == 0)
        .count()
        == 0
    )
