from parcel_analytics_etl_notebook_spark.plans.catalog import (
    oracle_sql,
    queries,
    registry,
)

__all__ = ["oracle_sql", "queries", "registry"]
