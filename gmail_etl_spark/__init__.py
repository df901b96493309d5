"""gmail_etl_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capabilities of the reference
Gmail ETL pipeline (``jwong924/gmail-etl``) as an idiomatic Spark
DataFrame engine, plus the large-scale training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) that the
reference's data model implies at 100 TB scale.

Layout:
    session     — SparkSession factory with the engine's scale posture
    schemas     — raw-zone / stage-1 StructTypes (SURVEY §1)
    functions/  — scalar kernels F1–F13 and pandas-UDF stages U1–U3
    operators/  — dedup (D1/D2), similarity (X1), text (X3), relational
    sources/    — ingestion sources (S1 Gmail fetcher, file readers)
    plans/      — the query catalog exposed through __spark_entry__
    streaming/  — Structured Streaming jobs (ST1–ST4, X5)
    pipeline    — end-to-end raw→stage-1 batch pipeline (reference parity)
"""

from gmail_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
