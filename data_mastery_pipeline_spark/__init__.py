"""data_mastery_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (YRR0/data-mastery-pipeline, surveyed in SURVEY.md),
re-expressed Spark-first: every operator is a declarative DataFrame/SQL
transformation so Catalyst/Tungsten pick the physical strategy, plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE on, UTC, snappy, Arrow).
- ``schemas``    : single-source-of-truth StructType registry (SURVEY §1.3).
- ``tables``     : testdata star-schema loaders.
- ``operators/`` : clean/derive/aggregate/window/join/setops/topk/quality.
- ``functions/`` : scalar column-expression builders (time, JSON, text).
- ``sources/``   : parquet/JDBC/Kafka/REST sources & sinks (import-gated).
- ``streaming/`` : Structured Streaming twins of the batch operators.
- ``dedup/``     : exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding.
- ``similarity/``: brute-force + LSH-bucketed ANN over embedding columns.
- ``multimodal/``: opaque binary columns with typed metadata + stub decoders.
- ``plans/``     : plan-inspection helpers (pushdown / broadcast asserts).
"""

__version__ = "0.1.0"
