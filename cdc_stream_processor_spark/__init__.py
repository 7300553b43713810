"""cdc_stream_processor_spark — a PySpark-native CDC analytics engine.

A from-scratch rebuild of the capabilities of darefamuy/cdc-stream-processor
(a Kafka Streams CDC notification processor; see SURVEY.md) re-expressed as
idiomatic PySpark: DataFrame/Catalyst for the batch surface, Structured
Streaming for the streaming surface, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis) designed for 100 TB scale.

Layout:
  session    — SparkSession factory tuned for local[32] testing / cluster scale
  schemas    — CDC envelope StructTypes + notification schema
  cdc        — envelope parsing/normalization (ops P1-P5, M1-M3, C3-C5)
  functions  — scalar helpers (C1-C15 of SURVEY.md §2.9)
  sources    — batch parquet loaders + CDC envelope simulator + streaming readers
  operators  — the five reference pipelines (batch twins) + relational surface
               + dedup/similarity/text extensions
  streaming  — Structured Streaming wiring incl. stateful balance reconciliation
"""

__version__ = "0.1.0"
