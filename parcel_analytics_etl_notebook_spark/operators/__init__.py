from parcel_analytics_etl_notebook_spark.operators.aggregates import (
    conditional_min_pivot,
    dq_summary,
)
from parcel_analytics_etl_notebook_spark.operators.asof import asof_join_backward
from parcel_analytics_etl_notebook_spark.operators.dedup import (
    dedup_exact,
    dedup_first_row,
    dedup_full_row,
)
from parcel_analytics_etl_notebook_spark.operators.dedup_fuzzy import (
    hamming_distance,
    lsh_candidate_pairs,
    poly_hash,
    shingle_hashes_from_tokens,
    shingles,
    simhash,
    with_minhash,
    with_simhash,
)
from parcel_analytics_etl_notebook_spark.operators.flatten import flatten_structs
from parcel_analytics_etl_notebook_spark.operators.multimodal import (
    extract_features,
    to_binary_payload,
)
from parcel_analytics_etl_notebook_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from parcel_analytics_etl_notebook_spark.operators.similarity import (
    assign_centroids,
    brute_force_topk,
    cosine_pairs_blocked,
    ivf_topk,
)
from parcel_analytics_etl_notebook_spark.operators.skew import (
    salted_agg,
    salted_join_small,
    with_salt,
)
from parcel_analytics_etl_notebook_spark.operators.textqa import (
    doc_fingerprint,
    predict_lang,
    quality_features,
)
from parcel_analytics_etl_notebook_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "conditional_min_pivot",
    "dq_summary",
    "asof_join_backward",
    "dedup_exact",
    "dedup_first_row",
    "dedup_full_row",
    "hamming_distance",
    "lsh_candidate_pairs",
    "poly_hash",
    "shingle_hashes_from_tokens",
    "shingles",
    "simhash",
    "with_minhash",
    "with_simhash",
    "flatten_structs",
    "extract_features",
    "to_binary_payload",
    "session_stats",
    "sessionize",
    "assign_centroids",
    "brute_force_topk",
    "cosine_pairs_blocked",
    "ivf_topk",
    "salted_agg",
    "salted_join_small",
    "with_salt",
    "doc_fingerprint",
    "predict_lang",
    "quality_features",
    "top_k",
    "top_k_per_group",
]
