"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference options-chains pipeline
(evdubs/oic-options-chains, studied read-only at /root/reference).

This is NOT a port: the reference is a Racket + embedded-PostgreSQL daily
ETL; this package re-expresses its relational semantics (SURVEY.md section 2)
as idiomatic Spark DataFrame plans so Catalyst/Tungsten pick the physical
strategy, and adds the large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing) the reference never
needed at its ~1e5-rows/day scale.

Layout
------
- ``session``    SparkSession factory tuned for the bench/test harness.
- ``schemas``    explicit StructTypes for the domain tables (schema.sql).
- ``functions``  scalar column helpers (decimal trunc, prior-year dates,
                 sentinel cleanup, percent decode, OCC symbol parsing).
- ``operators``  relational building blocks (as-of join, nearest-selection,
                 idempotent dedup/merge writers, FK validation, dedup
                 families, similarity search, text analysis).
- ``sources``    readers for the raw zone (dated dirs of JSON/HTML/CSV)
                 and the synthetic benchmark tables.
- ``parse``      the one non-relational kernel: HTML -> rows via
                 mapInPandas, with parser-version dispatch by ingest date.
- ``pipelines``  the four reference pipelines re-expressed end-to-end.
- ``streaming``  AvailableNow incremental wrapper + idempotent foreachBatch.
"""

__version__ = "0.1.0"
