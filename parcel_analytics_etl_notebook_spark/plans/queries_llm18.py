"""Round-8 LLM-pipeline additions, batch 7: max-min-fair token budget
allocation (water-filling).

The data-mixing decision every pretraining run makes — "we can afford
B tokens; how many from each source?" — under max-min fairness: small
sources keep everything they have, large sources are capped at a
common water level λ chosen so the total exactly meets the budget.
Stated entirely in exact BIGINT arithmetic (integer water level,
largest-remainder distribution of the division remainder), so the
allocation is bit-identical on both engines and sums to the budget by
construction.

Oracle-parity conventions as in plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parcel_analytics_etl_notebook_spark.functions.textfns import token_count
from parcel_analytics_etl_notebook_spark.plans.catalog import register, table
from parcel_analytics_etl_notebook_spark.plans.queries_llm import _SQL_TOKS


@register(
    "token_budget_waterfill",
    oracle=f"""
WITH d AS (
    SELECT source, CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS demand
    FROM documents GROUP BY source
),
s AS (
    SELECT *, row_number() OVER (ORDER BY demand, source) AS i,
           count(*) OVER () AS n,
           sum(demand) OVER (ORDER BY demand, source
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS pfx,
           sum(demand) OVER () // 2 AS b
    FROM d
),
lam AS (
    SELECT min(i) AS istar FROM s
    WHERE (b - (pfx - demand)) // (n - i + 1) < demand
),
lv AS (
    SELECT s.i AS istar,
           (b - (pfx - demand)) // (n - i + 1) AS lambda,
           (b - (pfx - demand)) % (n - i + 1) AS rem
    FROM s JOIN lam ON s.i = lam.istar
),
a AS (
    SELECT s.source, s.demand, s.i, lv.lambda, lv.rem, lv.istar,
           CASE WHEN s.demand <= lv.lambda THEN s.demand
                ELSE lv.lambda END AS alloc0,
           CASE WHEN s.demand > lv.lambda THEN 1 ELSE 0 END AS capped
    FROM s CROSS JOIN lv
),
fin AS (
    SELECT source, demand, capped,
           alloc0 + CASE WHEN capped = 1 AND
               row_number() OVER (PARTITION BY capped ORDER BY source)
               <= rem THEN 1 ELSE 0 END AS alloc
    FROM a
)
SELECT source,
       CAST(demand AS BIGINT) AS demand_tokens,
       CAST(alloc AS BIGINT) AS alloc_tokens,
       CAST(capped AS BIGINT) AS capped
FROM fin ORDER BY source
""",
)
def token_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min-fair token budget allocation across sources
    (water-filling): with budget B = half the corpus's tokens, every
    source keeps min(demand, λ) where the integer water level λ is the
    unique floor level at which fully serving all smaller sources plus
    λ per larger source meets B; the division remainder goes +1 each
    to the lexicographically-first capped sources (the
    largest_remainder_quota discipline), so Σ alloc = B EXACTLY. This
    is the data-mixing step between source_mixture_weights (what the
    mix IS) and per-source sampling (lang_token_budget_filter /
    token_weighted_sample): small sources are never starved, big
    sources share the cap — the max-min fairness every "don't let
    CommonCrawl drown the code data" policy encodes.

    Scale shape: demands are one map-combined aggregate over the
    corpus; everything after runs on the SOURCE-grain frame (~tens of
    rows) — the sorted-prefix windows and the λ pick are bounded by
    the number of sources, a catalog constant, never data volume.
    All-BIGINT: integer λ, integer remainder, no float ever touches
    the allocation."""
    d = (
        table(spark, sf_dir, "documents")
        .select("source", token_count("text").alias("__n"))
        .groupBy("source")
        .agg(F.sum("__n").cast("bigint").alias("demand"))
    )
    wo = Window.orderBy("demand", "source")
    wall = Window.partitionBy()
    s = d.select(
        "source",
        "demand",
        F.row_number().over(wo).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("demand").over(wo).alias("pfx"),
        F.expr("CAST(sum(demand) OVER () div 2 AS BIGINT)").alias("b"),
    ).withColumn(
        "lam_i", F.expr("(b - (pfx - demand)) div (n - i + 1)")
    )
    istar = F.min(
        F.when(F.col("lam_i") < F.col("demand"), F.col("i"))
    ).over(wall)
    a = (
        s.withColumn("istar", istar)
        .withColumn(
            "lambda",
            F.max(
                F.when(F.col("i") == F.col("istar"), F.col("lam_i"))
            ).over(wall),
        )
        .withColumn(
            "rem",
            F.max(
                F.when(
                    F.col("i") == F.col("istar"),
                    F.expr("(b - (pfx - demand)) % (n - i + 1)"),
                )
            ).over(wall),
        )
        # degenerate all-zero-demand corpus: no row has lam_i < demand,
        # istar/lambda are NULL, and the oracle's lam CTE is empty — drop
        # the undefined rows so BOTH engines return empty (ADVICE r08)
        .filter(F.col("lambda").isNotNull())
        .select(
            "source",
            "demand",
            F.when(F.col("demand") <= F.col("lambda"), F.col("demand"))
            .otherwise(F.col("lambda"))
            .alias("alloc0"),
            F.when(F.col("demand") > F.col("lambda"), 1)
            .otherwise(0)
            .alias("capped"),
            "rem",
        )
    )
    wcap = Window.partitionBy("capped").orderBy("source")
    return (
        a.withColumn("crn", F.row_number().over(wcap))
        .select(
            "source",
            F.col("demand").cast("bigint").alias("demand_tokens"),
            (
                F.col("alloc0")
                + F.when(
                    (F.col("capped") == 1) & (F.col("crn") <= F.col("rem")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_tokens"),
            F.col("capped").cast("bigint").alias("capped"),
        )
        .orderBy("source")
    )
