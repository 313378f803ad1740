"""hours_api_clickup_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``Sinfjell/hours-api-clickup`` (a ClickUp → BigQuery ETL pipeline, see
``/root/reference/fetch_clickup_data.py``) as idiomatic Spark DataFrame /
SQL operators, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the
reference's domain implies at 100 TB scale.

Layout:
    session     — SparkSession factory with scale-aware defaults
    schemas     — explicit StructTypes for every table (reference pins
                  schemas by hand; so do we)
    functions/  — scalar column-expression functions (safe casts, epoch-ms
                  timestamps, Oslo civil dates, hashing, text stats)
    operators/  — relational operators (flatten/transform, dedupe, merge
                  upsert algebra, split-explode, hierarchy flattening)
    sources/    — readers, chunk planner, paginated-fetch abstraction
    sinks/      — CSV backup, parquet table writers
    plans/      — the analytical query surface (doc-SQL equivalents) and
                  the driver-facing query registry
    datapipe/   — beyond-reference scale operators: dedup families,
                  ANN similarity search, text analysis, multimodal columns
    streaming/  — Structured Streaming refresh (watermarked late data)
"""

__version__ = "0.1.0"
