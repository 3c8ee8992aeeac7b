"""Free pipeline metrics via ``Observation`` (SURVEY.md §2.5 A9).

The reference runs seven eager ``.count()`` actions purely to log row
counts (`/root/reference/src/extract.py:100`,
`/root/reference/src/transform.py:110-248`), each re-executing the full
uncached lineage — at 100 TB that is seven extra table scans.
``DataFrame.observe`` attaches aggregates to the *next* action: the
metrics ride along with the write that was happening anyway, costing one
codegen'd accumulator instead of a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a row-count metric to ``df``. Returns (df, observation);
    read ``observation.get["rows"]`` after the next action on ``df``."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs
