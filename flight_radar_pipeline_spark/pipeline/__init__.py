"""Medallion transforms (bronze → silver → gold) as composable DataFrame fns."""

from flight_radar_pipeline_spark.pipeline.silver import (
    build_silver,
    cdc_apply,
    dedup_by_key,
    merge_rollup,
    merge_snapshot,
    scd2_apply,
)
from flight_radar_pipeline_spark.pipeline.corpus import CorpusResult, run_corpus_prep
from flight_radar_pipeline_spark.pipeline.gold import build_gold
from flight_radar_pipeline_spark.pipeline.runner import PipelineResult, run_pipeline

__all__ = [
    "CorpusResult",
    "run_corpus_prep",
    "build_silver",
    "build_gold",
    "cdc_apply",
    "dedup_by_key",
    "merge_snapshot",
    "merge_rollup",
    "scd2_apply",
    "run_pipeline",
    "PipelineResult",
]
