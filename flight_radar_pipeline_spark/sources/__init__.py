"""Schema-enforced batch sources."""

from flight_radar_pipeline_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_parquet,
)

__all__ = ["load_table", "load_tables", "read_csv", "read_parquet"]
