"""Vector math over ``array<float>`` embedding columns.

Uses higher-order functions (``zip_with`` + ``aggregate``) so the math
runs in the JVM on codegen'd expressions — no Python round trip. Cast to
double FIRST so accumulation happens in float64 (matches the SQL oracle,
avoids float32 drift).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length numeric arrays."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm."""
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null if either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None).cast("double")).otherwise(
        dot(a, b) / (na * nb)
    )


def _f64(x: float) -> str:
    """Exact SQL double literal: repr round-trips IEEE doubles, and the
    string→double CAST parses them without DECIMAL coercion."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def dot_literal(vec: str, weights: list[float]) -> Column:
    """Dot product with a DRIVER-SIDE constant vector, unrolled into a
    left-associative codegen'd sum.

    Bit-identical to ``dot(vec, F.array(lits))``: the HOF fold computes
    ((0 + p₀) + p₁) + …, and this emits the same chain — but as a plain
    expression tree that whole-stage codegen compiles, where HOF lambdas
    stay interpreted. Built as ONE ``F.expr`` string: composing the
    same tree from python ``Column`` ops costs hundreds of py4j round
    trips per call (dominates k-means iteration time at small SF); a
    single JVM-side parse is ~free. ``vec`` is therefore a column NAME.
    Use whenever one side is a Python constant (trained centroids,
    power-iteration direction, LSH hyperplanes)."""
    expr = "CAST(0.0 AS DOUBLE)"
    for d, wd in enumerate(weights):
        # ±1 weights (LSH hyperplanes, SimHash) emit `expr ± x` instead
        # of `expr + x * ±1.0` — IEEE-identical (x*1.0 == x and
        # a + (-x) == a - x exactly), but the janino source for a
        # 48-plane fingerprint shrinks ~40%, which is most of its
        # whole-stage-codegen compile time (VERDICT r09 #5).
        if wd == 1.0:
            expr = f"({expr} + CAST({vec}[{d}] AS DOUBLE))"
        elif wd == -1.0:
            expr = f"({expr} - CAST({vec}[{d}] AS DOUBLE))"
        else:
            expr = f"({expr} + CAST({vec}[{d}] AS DOUBLE) * {_f64(wd)})"
    return F.expr(expr)


def norm_literal_sq(vec: str, dim: int) -> Column:
    """Σ v[d]² unrolled (same fold order as l2_norm, codegen'd; one
    F.expr parse — see dot_literal)."""
    expr = "CAST(0.0 AS DOUBLE)"
    for d in range(dim):
        expr = (
            f"({expr} + CAST({vec}[{d}] AS DOUBLE) * CAST({vec}[{d}] AS DOUBLE))"
        )
    return F.expr(expr)


def _unrolled_dot_sql(a: str, b: str, dim: int) -> str:
    expr = "CAST(0.0 AS DOUBLE)"
    for d in range(dim):
        expr = f"({expr} + CAST({a}[{d}] AS DOUBLE) * CAST({b}[{d}] AS DOUBLE))"
    return expr


def cosine_cols(a: str, b: str, dim: int) -> Column:
    """Cosine between two vector COLUMNS with statically-known ``dim``,
    unrolled into one ``F.expr`` (same left-associative fold order as
    :func:`cosine_similarity` → identical IEEE doubles, oracle-safe).

    CAVEAT: at dim≈64 the fused tree (dot + 2 norms + guard, the norms
    appearing twice) exceeds the JVM's 64 KB codegen method limit, so
    the WHOLE expression falls back to interpreted eval — slower than
    the HOF form it was meant to beat (measured: ann_cosine_topk
    1.40s → 3.52s when this crept onto the hot path in round 2). On
    hot paths precompute per-side norm columns and use
    :func:`cosine_prenormed` instead; keep this form only for small
    ``dim`` or one-off expressions."""
    dot = _unrolled_dot_sql(a, b, dim)
    na = f"sqrt({_unrolled_dot_sql(a, a, dim)})"
    nb = f"sqrt({_unrolled_dot_sql(b, b, dim)})"
    return F.expr(
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE ({dot}) / ({na} * {nb}) END"
    )


def cosine_prenormed(a: str, b: str, na: str, nb: str, dim: int) -> Column:
    """Cosine between vector columns ``a``/``b`` whose L2 norms were
    PRECOMPUTED into columns ``na``/``nb`` (each via
    ``F.sqrt(norm_literal_sq(...))`` so the IEEE values match the fused
    form exactly).

    This is the hot-path form: the fully fused :func:`cosine_cols`
    inlines dot + both norms + the zero-guard into one expression —
    for dim=64 that overflows the JVM's 64 KB codegen method limit and
    the whole expression falls back to interpreted eval (measured 2.5×
    on ann_cosine_topk at sf0.1). Splitting the norms into their own
    projected columns keeps every codegen unit under the limit while
    producing bit-identical doubles: same left-associative fold per
    chain, same ``dot / (na * nb)`` division order."""
    dot_sql = _unrolled_dot_sql(a, b, dim)
    return F.expr(
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE ({dot_sql}) / ({na} * {nb}) END"
    )


def cosine_prenormed_hof(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """HOF twin of :func:`cosine_prenormed`: per-pair dot via
    ``zip_with + aggregate``, side norms precomputed into columns.

    Measured (Spark 4.1, local, 200k rows × dim 64, single core):
    the unrolled dot chain is the SLOWEST form under whole-stage
    codegen — the 64-deep expression inlines into a giant method the
    JIT bails out of (8–11 µs/row) — while the HOF fold runs ~4.5
    µs/row and per-expression codegen (wholeStage off) ~1.8 µs/row.
    So for quadratic pair-scoring hot paths, prefer THIS form: the
    HOF dot plus prenormed norms keeps per-pair work to one fold and
    avoids the JIT bailout. Bit-identical doubles to cosine_prenormed
    and cosine_similarity: the aggregate fold is the same
    left-associative ((0+p₀)+p₁)+… chain in float64, and the division
    order ``dot / (na * nb)`` matches."""
    na_c = F.col(na) if isinstance(na, str) else na
    nb_c = F.col(nb) if isinstance(nb, str) else nb
    return F.when(
        (na_c == 0) | (nb_c == 0), F.lit(None).cast("double")
    ).otherwise(dot(a, b) / (na_c * nb_c))


def cosine_literal(vec: str, weights: list[float]) -> Column:
    """Cosine against a driver-side constant vector — the codegen'd
    twin of ``cosine_similarity(vec, F.array(lits))``. The constant
    side's norm folds at plan-build time in Python (identical
    left-associative double chain → identical IEEE value)."""
    wnorm_sq = 0.0
    for wd in weights:
        wnorm_sq = wnorm_sq + float(wd) * float(wd)
    wnorm = wnorm_sq ** 0.5
    na = F.sqrt(norm_literal_sq(vec, len(weights)))
    return F.when(
        (na == 0) | (F.lit(wnorm) == 0), F.lit(None).cast("double")
    ).otherwise(dot_literal(vec, weights) / (na * F.lit(wnorm)))
