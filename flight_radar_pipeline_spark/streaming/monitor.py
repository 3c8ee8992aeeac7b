"""Streaming observability: a StreamingQueryListener capturing per-batch
progress into driver-side records.

Production streaming needs per-trigger telemetry — input rows, batch
duration, state-store size — without scraping the UI. Spark's listener
API (public since 3.4 for Python) delivers a progress event per
microbatch commit; this module accumulates them and exposes the result
as rows for a metrics sink.

Scale posture: the listener runs on the DRIVER and holds one small dict
per (query, batch) — bounded by trigger count, not data volume. At
100 TB a real deployment forwards each event to a metrics bus inside
``onQueryProgress`` instead of accumulating; the accumulation here is
the test-observable core of that same hook.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Accumulates one record per committed microbatch:
    (query_name, query_id, batch_id, num_input_rows, batch_duration_ms,
    state_rows). Thread-safe — progress events arrive on the streaming
    listener bus thread."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.records: list[dict] = []

    # -- StreamingQueryListener protocol ------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 - Spark API
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 - Spark API
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        rec = {
            "query_name": p.get("name"),
            "query_id": p.get("id"),
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows", 0),
            "batch_duration_ms": p.get("batchDuration"),
            "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
        }
        with self._lock:
            self.records.append(rec)

    def onQueryTerminated(self, event) -> None:  # noqa: N802 - Spark API
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802 - Spark API
        pass

    # -- accessors ----------------------------------------------------
    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self.records)

    def to_df(self, spark: SparkSession):
        """Materialize captured records as a DataFrame for a metrics
        sink (empty-safe: returns an empty typed frame)."""
        schema = (
            "query_name string, query_id string, batch_id bigint, "
            "num_input_rows bigint, batch_duration_ms bigint, state_rows bigint"
        )
        return spark.createDataFrame(self.snapshot(), schema)


class attach_listener:
    """Context manager: register a BatchMetricsListener for the block and
    ALWAYS remove it on exit (leaked listeners observe every later query
    in the session — the bug this wrapper exists to prevent)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.listener = BatchMetricsListener()

    def __enter__(self) -> BatchMetricsListener:
        self.spark.streams.addListener(self.listener)
        return self.listener

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self.listener)
