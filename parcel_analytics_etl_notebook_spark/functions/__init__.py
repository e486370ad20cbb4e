from parcel_analytics_etl_notebook_spark.functions.keys import surrogate_key
from parcel_analytics_etl_notebook_spark.functions.textfns import (
    normalize_text,
    token_count,
    tokens,
)
from parcel_analytics_etl_notebook_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
)

__all__ = [
    "surrogate_key",
    "normalize_text",
    "token_count",
    "tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
