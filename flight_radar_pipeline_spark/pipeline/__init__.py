"""Medallion transforms (bronze → silver → gold) as composable DataFrame fns."""

from flight_radar_pipeline_spark.pipeline.silver import build_silver, dedup_by_key, merge_snapshot
from flight_radar_pipeline_spark.pipeline.gold import build_gold
from flight_radar_pipeline_spark.pipeline.runner import PipelineResult, run_pipeline

__all__ = [
    "build_silver",
    "build_gold",
    "dedup_by_key",
    "merge_snapshot",
    "run_pipeline",
    "PipelineResult",
]
