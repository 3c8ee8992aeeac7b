"""flight_radar_pipeline_spark — a PySpark-native analytics engine.

Re-architecture of the capabilities of ``GlobeCitizen/flight-radar-pipeline``
(reference at ``/root/reference``, a hand-wired Medallion ETL script) as an
engine-shaped library:

- ``session``    — SparkSession factory (local & cluster), AQE on, pinned TZ.
- ``schemas``    — central StructType registry shared by readers/writers/tests.
- ``functions``  — UDF-free column-expression library (haversine, continent
                   lookup, text analytics, vector math).
- ``pipeline``   — bronze→silver→gold transforms as composable DataFrame fns.
- ``plans``      — the reference's six analytics queries (Q1–Q6) plus the
                   extended relational query surface, DataFrame-in/out.
- ``operators``  — scale-path operators the reference lacks: dedup (exact,
                   MinHash-LSH, SimHash, n-gram Jaccard), similarity search.
- ``sources``/``sinks`` — schema-enforced readers, partitioned writers,
                   object-store conf.
- ``streaming``  — Structured Streaming surface over the hourly feed.
- ``multimodal`` — binary-column plumbing for image/audio payloads.

Design rules (SURVEY.md §4, §7): declarative DataFrame plans only — no
row-at-a-time Python UDFs on any hot path; broadcast small dimensions;
deterministic semantics where the reference is order-dependent.
"""

__version__ = "0.1.0"
