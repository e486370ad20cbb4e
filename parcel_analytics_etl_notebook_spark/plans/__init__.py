from parcel_analytics_etl_notebook_spark.plans.catalog import (
    oracle_sql,
    queries,
    registry,
)
from parcel_analytics_etl_notebook_spark.plans.diagnostics import (
    formatted_plan,
    plan_summary,
)
from parcel_analytics_etl_notebook_spark.plans.star import (
    DimSpec,
    build_date_dim,
    build_dim,
    resolve_fk,
    scd1_upsert,
)

__all__ = [
    "oracle_sql",
    "queries",
    "registry",
    "formatted_plan",
    "plan_summary",
    "DimSpec",
    "build_date_dim",
    "build_dim",
    "resolve_fk",
    "scd1_upsert",
]
