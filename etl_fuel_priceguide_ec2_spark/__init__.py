"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL job ``ptv1p3r/etl-fuel-priceguide-ec2``
(see SURVEY.md), re-expressed Spark-first, plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.

Layout:
    session.py     — tuned SparkSession factory (AQE, Arrow, UTC)
    sources/       — parquet catalog + REST-source scaffolding
    operators/     — relational + extension operators (pure DataFrame fns)
    functions/     — scalar-function battery and portable hashing
    plans/         — composed end-to-end pipelines (the reference's EP1)
    streaming/     — Structured Streaming mirrors of the batch semantics
    registry.py    — named query builders + DuckDB oracle SQL (the
                     contract surface consumed by __spark_entry__.py)
"""

from etl_fuel_priceguide_ec2_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
