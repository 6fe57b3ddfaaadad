"""sanctum_spark — a PySpark-native analytics & event-processing engine.

A from-scratch re-expression of the capabilities of the reference event
platform ``sackosoft/sanctum`` (see SURVEY.md) on top of Apache Spark:

- ``sanctum_spark.session``   — SparkSession factory tuned for the harness
- ``sanctum_spark.io``        — parquet table loaders for the synthetic schema
- ``sanctum_spark.spells``    — the "spell" event runtime (per-event UDF,
  topic routing, feedback loop) re-expressed as DataFrame ops + mapInPandas
- ``sanctum_spark.codec``     — MessagePack codec with the reference's exact
  type rules (reference: src/zlmp.zig)
- ``sanctum_spark.operators`` — generalized relational / LLM-pipeline
  operators (joins, dedup, similarity search, text analysis, multimodal)
- ``sanctum_spark.streaming`` — Structured Streaming surface (windows,
  watermarks, stateful spells)
- ``sanctum_spark.queries``   — the query registry backing __spark_entry__
"""

__version__ = "0.1.0"
