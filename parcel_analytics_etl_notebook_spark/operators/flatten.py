"""Recursive struct flattener (SURVEY §2.2 P1).

Generalizes the reference's hand-written 21-line dotted-path select
(``/root/reference/etl/main.py:134-161``) to any depth of nesting.
Because it compiles to a single ``select`` of dotted paths, Catalyst's
nested-schema pruning pushes the projection into the parquet/JSON scan —
unread leaves are never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def flatten_structs(
    df: DataFrame,
    sep: str = "_",
    include: list[str] | None = None,
    max_depth: int = 32,
) -> DataFrame:
    """Flatten all (or ``include``-selected) struct columns into
    top-level columns named by their joined dotted path.

    ``include`` holds dotted source paths to keep (projection pruning at
    flatten time, like the reference dropping ``paid``/``options``);
    ``None`` keeps every leaf.
    """
    cols: list[tuple[str, str]] = []  # (dotted_path, flat_name)

    def walk(schema: StructType, prefix: list[str], depth: int) -> None:
        for field in schema.fields:
            path = prefix + [field.name]
            if isinstance(field.dataType, StructType) and depth < max_depth:
                walk(field.dataType, path, depth + 1)
            else:
                dotted = ".".join(path)
                if include is None or dotted in include:
                    cols.append((dotted, sep.join(path)))

    walk(df.schema, [], 0)
    return df.select([F.col(d).alias(n) for d, n in cols])
