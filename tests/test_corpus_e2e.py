"""corpus_training_manifest: the end-to-end composed lineage (exact dedup
→ near dedup → decontaminate → quality → stratified sample → pack →
token ids). The DuckDB oracle hash-checks values (tests/test_battery.py);
here we pin the structural invariants each stage guarantees and the
single-computation posture (the sampled frame is persisted — its three
consumers read the cache, so the corpus-sized upstream runs once)."""

from __future__ import annotations

from flight_radar_pipeline_spark.plans.battery_corpus import (
    _E2E_BUDGET,
    _E2E_LANGS,
    _E2E_QUOTA,
    corpus_training_manifest,
)

SF_DIR = "/root/testdata/sf0.001"


def _manifest(spark):
    return corpus_training_manifest(spark, SF_DIR)


def test_stage_invariants_hold(spark):
    rows = _manifest(spark).collect()
    assert rows, "pipeline produced an empty manifest"
    # stratified quotas: at most QUOTA docs per language, langs allowlisted
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert set(per_lang) <= set(_E2E_LANGS)
    assert max(per_lang.values()) <= _E2E_QUOTA
    # dedup: unique doc ids; quality gate: token band survived the chain
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert all(20 <= r.n_tokens <= 1000 for r in rows)
    # packing: offsets are the per-bucket prefix sums (disjoint coverage)
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r.start_offset)
        run = 0
        for r in rs:
            assert r.start_offset == run
            assert r.pack_id == r.bucket * 2**32 + r.start_offset // _E2E_BUDGET
            run += r.n_tokens
    # encoding: ids string has exactly n_tokens entries
    assert all(len(r.ids.split(" ")) == r.n_tokens for r in rows)


def test_sampled_stage_is_checkpointed_not_recomputed(spark):
    """The three downstream consumers (packing, vocab-encoding, and the
    manifest projection) must read the materialized sampled frame —
    walking the executed plan to its TRUE leaves (descending through the
    AQE wrapper and query stages) must find exactly three checkpoint
    RDD scans and zero file scans: the corpus-sized dedup /
    decontamination / quality chain is never re-run per consumer, and
    (since localCheckpoint truncates lineage) never re-APPEARS under
    them either — the static plan stays O(10) exchanges as the chain
    grows. (Plan STRINGS can't prove the first half — InMemoryRelation
    used to print its cached child including file scans.)"""
    df = _manifest(spark)
    leaves: list[str] = []

    def walk(n):
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(n.inputPlan())
            return
        if "QueryStageExec" in cls:
            walk(n.plan())
            return
        if cls in ("InMemoryTableScanExec", "RDDScanExec"):
            leaves.append("materialized")
            return
        kids = n.children()
        if kids.size() == 0:
            leaves.append(cls)
            return
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    assert leaves == ["materialized"] * 3, leaves


def test_manifest_static_plan_is_truncated(spark):
    """The lineage-truncation claim, pinned: the composed chain's static
    plan must hold O(10) exchanges, not the ~840 the un-truncated
    composition accumulated (every upstream stage re-planned under each
    of the three consumers)."""
    df = _manifest(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 20, plan.count("Exchange")


def test_manifest_matches_standalone_stage_counts(spark):
    """Cross-check the composed chain against independently-run stages:
    every manifest doc must survive the standalone exact-dedup winners and
    the per-language quota arithmetic."""
    from flight_radar_pipeline_spark.operators.dedup import dedup_exact
    from flight_radar_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    winners = {r.doc_id for r in dedup_exact(docs).select("doc_id").collect()}
    rows = _manifest(spark).collect()
    assert all(r.doc_id in winners for r in rows)
