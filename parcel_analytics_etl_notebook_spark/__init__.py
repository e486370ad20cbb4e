"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference parcel-analytics ETL pipeline
(ern-estado/Parcel-Analytics-ETL-Notebook), generalized into a reusable,
100-TB-scale operator library.

Layout
------
- ``session``    : SparkSession factory with pinned, scale-sane config.
- ``sources``    : readers (csv-multiline/parquet/json) + writers.
- ``functions``  : scalar helpers (deterministic surrogate keys, text,
                   vector math) — all built on pyspark.sql.functions so
                   they stay JVM-side / whole-stage-codegen'd.
- ``operators``  : composable DataFrame -> DataFrame operators
                   (flatten, dedup family, join family, windows, top-k,
                   as-of join, range join, sessionize, similarity
                   search, text analysis, multimodal plumbing).
- ``plans``      : star-schema ETL recipes (build_dim/build_fact), the
                   single-pass DQ checker, and the query catalog that
                   backs ``__spark_entry__.py``.
- ``streaming``  : Structured Streaming variants of the event-lifecycle
                   operators.
"""

from parcel_analytics_etl_notebook_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
