"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Twitch chat analyser
(``vaehx/twitch-chat-analyser``, surveyed in SURVEY.md).

Not a port: every pipeline is a pure ``DataFrame -> DataFrame`` function
expressed with the DataFrame/SQL API so Catalyst owns the physical plan;
streaming wraps the same functions at the edges (Structured Streaming,
update mode, ``foreachBatch`` merge sinks).

Layout
------
- ``session``    SparkSession factory tuned for local[32] test runs.
- ``dims``       Dimension-table seed data (emotes/channels/phrases) as
                 plain Python constants rendered both as Spark DataFrames
                 and as DuckDB ``VALUES`` SQL (single source of truth for
                 the oracle comparison).
- ``ingest``     Table loaders + the events->messages stream mapping.
- ``operators``  Write-path aggregations (SURVEY §2.A), dedup/similarity/
                 text-analysis/multimodal operators (SURVEY §7.5).
- ``plans``      Read-path dashboard/API queries (SURVEY §2.B).
- ``functions``  Scalar/series helpers (time math, resample-interpolate).
- ``streaming``  Structured Streaming wrapper + exactly-once sinks.
- ``facts``      Serving-layer cache of the shared fact relations
                 (plan-equality substitution; used by the driver entry).
- ``sources``    Kafka wire serde (+ testable wire-twin stub), file
                 formats, binaryFile media ingest, dim maintenance.
- ``registry``   queries()/oracle_sql() — every operator paired with its
                 DuckDB oracle (ROWS_ONLY empty since round 6: the HLL
                 estimates emit exact-count + within-bound booleans).
"""

__version__ = "0.1.0"
