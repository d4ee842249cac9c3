"""dug-data-ingest-spark: a PySpark-native analytics engine with the
query and data-processing capabilities of helxplatform/dug-data-ingest.

The reference (read-only at /root/reference) is a single-threaded,
row-at-a-time Python ETL toolkit; this package re-expresses its entire
operator surface (SURVEY.md §2) as idiomatic Spark DataFrame / SQL
plans so Catalyst + Tungsten pick the physical strategy, and adds the
large-scale training-data-pipeline operators (dedup, similarity,
multimodal, text analysis) the reference lacks.

Layout
------
session.py    SparkSession factory (AQE, Arrow, UTC, sane shuffle width)
operators/    pure DataFrame->DataFrame / Column-expression operators,
              one module per SURVEY §2 family
functions/    scalar / text / vector column-expression libraries
sources/      readers & writers (csv, json docs, dbGaP XML, fixture-
              replayable REST/FTP, recursive listings, partitioned sinks)
plans/        the reference's three entry-point pipelines re-expressed
              as DataFrame lineages (bdc, heal, lakefs index)
streaming/    Structured Streaming surface over the events table
ext/          scale extensions: dedup, similarity search, text analysis,
              multimodal plumbing
queries/      binding of every SURVEY §2 slug to the driver's testdata
              tables, each with a DuckDB oracle (the correctness gate)
"""

__version__ = "0.1.0"
