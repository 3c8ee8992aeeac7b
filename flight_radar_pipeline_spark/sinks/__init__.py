"""Batch sinks: partitioned writers + snapshot resolution (SURVEY.md §2.2)."""

from flight_radar_pipeline_spark.sinks.writers import (
    latest_snapshot,
    with_date_parts,
    write_bucketed_table,
    write_if_absent,
    write_partitioned,
    write_single_csv,
)

__all__ = [
    "latest_snapshot",
    "with_date_parts",
    "write_bucketed_table",
    "write_if_absent",
    "write_partitioned",
    "write_single_csv",
]
