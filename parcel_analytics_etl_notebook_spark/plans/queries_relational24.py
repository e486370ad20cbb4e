"""Round-8 relational additions, batch 5: join-cardinality estimator
audit.

The textbook uniform-frequency join-size estimate |A ⋈ B| ≈
|A|·|B| / max(ndv_A, ndv_B) is what every cost-based optimizer
(Catalyst's CBO included) starts from; this query computes the
estimate AND the true cardinality for three canonical joins and
reports the error — the audit a pipeline owner runs to decide whether
to ANALYZE (collect column stats) or hint a join order.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.plans.catalog import register, table

#: (join label, left table, left key, right table, right key)
_EST_JOINS = (
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
)


def _est_sql_block(label, lt, lk, rt, rk) -> str:
    return f"""
SELECT '{label}' AS join_name,
       CAST((SELECT count(*) FROM {lt}) AS BIGINT) AS n_left,
       CAST((SELECT count(*) FROM {rt}) AS BIGINT) AS n_right,
       CAST((SELECT count(DISTINCT {lk}) FROM {lt}) AS BIGINT) AS ndv_left,
       CAST((SELECT count(DISTINCT {rk}) FROM {rt}) AS BIGINT) AS ndv_right,
       CAST((SELECT count(*) FROM {lt}) * (SELECT count(*) FROM {rt})
            // greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                        (SELECT count(DISTINCT {rk}) FROM {rt}))
            AS BIGINT) AS est_rows,
       CAST((SELECT count(*) FROM {lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk})
            AS BIGINT) AS actual_rows,
       CAST(abs((SELECT count(*) FROM {lt}) * (SELECT count(*) FROM {rt})
                // greatest((SELECT count(DISTINCT {lk}) FROM {lt}),
                            (SELECT count(DISTINCT {rk}) FROM {rt}))
                - (SELECT count(*) FROM {lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk}))
            * 10000
            // (SELECT count(*) FROM {lt} JOIN {rt} ON {lt}.{lk} = {rt}.{rk})
            AS BIGINT) AS err_bp
"""


@register(
    "join_cardinality_estimator_audit",
    oracle=" UNION ALL ".join(
        _est_sql_block(*j) for j in _EST_JOINS
    )
    + " ORDER BY join_name",
)
def join_cardinality_estimator_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cost-based-optimizer sanity check: for three canonical joins,
    the uniform-frequency cardinality estimate |A|·|B|/max(ndv_A,
    ndv_B) next to the TRUE join size, with the error in exact basis
    points. PK-FK joins (all three here) should estimate near-exactly
    under the uniform assumption — a large err_bp flags either key
    skew (the estimate's known blind spot) or referential-integrity
    holes (orphan keys), and tells the owner whether collected column
    stats would actually fix the optimizer's join ordering.

    Scale shape: per join, two 1-row stat aggregates (count + exact
    countDistinct, one scan each side) and the true-count equi-join —
    the only fact-scale stage, and the thing the estimate exists to
    avoid; combining the 1-row frames is a plan-fence-allowlisted
    scalar cross join. All arithmetic stays in BIGINT (the |A|·|B|
    product fits int64 comfortably at these NDVs; at petabyte row
    counts the production form divides before multiplying)."""
    out = None
    for label, lt, lk, rt, rk in _EST_JOINS:
        left = table(spark, sf_dir, lt)
        right = table(spark, sf_dir, rt)
        sl = left.agg(
            F.count(F.lit(1)).alias("n_left"),
            F.countDistinct(lk).alias("ndv_left"),
        )
        sr = right.agg(
            F.count(F.lit(1)).alias("n_right"),
            F.countDistinct(rk).alias("ndv_right"),
        )
        act = (
            left.select(F.col(lk).alias("__k"))
            .join(right.select(F.col(rk).alias("__k")), "__k")
            .agg(F.count(F.lit(1)).alias("actual_rows"))
        )
        row = (
            sl.crossJoin(sr)
            .crossJoin(act)
            .select(
                F.lit(label).alias("join_name"),
                F.col("n_left").cast("bigint").alias("n_left"),
                F.col("n_right").cast("bigint").alias("n_right"),
                F.col("ndv_left").cast("bigint").alias("ndv_left"),
                F.col("ndv_right").cast("bigint").alias("ndv_right"),
                F.expr(
                    "n_left * n_right div greatest(ndv_left, ndv_right)"
                )
                .cast("bigint")
                .alias("est_rows"),
                F.col("actual_rows").cast("bigint").alias("actual_rows"),
                F.expr(
                    "abs(n_left * n_right div greatest(ndv_left, ndv_right)"
                    " - actual_rows) * 10000 div actual_rows"
                )
                .cast("bigint")
                .alias("err_bp"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")
