"""2-D Pareto skyline (maximize both dimensions).

Semantic definition: a row is ON the skyline iff no other row
dominates it — dominates = ≥ in both dimensions and > in at least
one. Equal points never dominate each other, so duplicates of a
frontier point all survive.

The naive form is a quadratic NOT-EXISTS self-join (kept as the
oracle in plans/queries_relational9.pareto_customers). The scale-safe
rewrite here is O(N log N):

1. collapse to one row per distinct x (max y per group) — one shuffle,
   output O(distinct x);
2. running strictly-preceding max of y along descending x over that
   COLLAPSED frame — a single-partition window whose input is already
   collapsed (at extreme x-cardinality, pre-thin per partition with a
   monotone local frontier pass before the global window: a point
   dominated within its partition is dominated globally);
3. a (x, y)-equi-join back tags the surviving rows.

Property-tested against the quadratic Python model for arbitrary
duplicate/tie structures (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Rows of ``df`` not dominated on (``x``, ``y``), both maximized.

    All input columns are preserved; row multiplicity of frontier
    points is preserved (equal points don't dominate each other).
    NULL in either dimension never reaches the frontier (dropped, the
    same convention an inequality join would apply).
    """
    pts = df.filter(F.col(x).isNotNull() & F.col(y).isNotNull())
    grp = pts.groupBy(x).agg(F.max(y).alias("__gmax"))
    w = Window.orderBy(F.col(x).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = (
        grp.withColumn("__prevmax", F.max("__gmax").over(w))
        .filter(
            F.col("__prevmax").isNull() | (F.col("__gmax") > F.col("__prevmax"))
        )
        .select(F.col(x).alias("__fx"), F.col("__gmax").alias("__fy"))
    )
    return (
        pts.join(
            frontier, (F.col(x) == F.col("__fx")) & (F.col(y) == F.col("__fy"))
        )
        .drop("__fx", "__fy")
    )
