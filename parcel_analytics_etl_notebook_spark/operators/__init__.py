from parcel_analytics_etl_notebook_spark.operators.aggregates import (
    conditional_min_pivot,
    dq_summary,
)
from parcel_analytics_etl_notebook_spark.operators.dedup import (
    dedup_exact,
    dedup_first_row,
)
from parcel_analytics_etl_notebook_spark.operators.flatten import flatten_structs
from parcel_analytics_etl_notebook_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "conditional_min_pivot",
    "dq_summary",
    "dedup_exact",
    "dedup_first_row",
    "flatten_structs",
    "top_k",
    "top_k_per_group",
]
