"""Schema-enforced batch sources + API source adapters."""

from flight_radar_pipeline_spark.sources.flight_api import (
    WORLD,
    Zone,
    fetch_all,
    fetch_all_distributed,
    fetch_zone_recursive,
    rows_to_df,
)
from flight_radar_pipeline_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    read_parquet,
)

__all__ = [
    "WORLD",
    "Zone",
    "fetch_all",
    "fetch_all_distributed",
    "fetch_zone_recursive",
    "load_table",
    "load_tables",
    "read_csv",
    "read_parquet",
    "rows_to_df",
]
