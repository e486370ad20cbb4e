"""Iterative graph operators: connected components via min-label
propagation — the standard Spark iterative-algorithm shape (persist the
frontier, loop joins until fixpoint, unpersist behind you).

Used for near-duplicate GROUP assignment: LSH/Jaccard emit pairs, but
dedup needs transitive closure (A~B, B~C ⇒ keep one of {A,B,C}).
Each iteration is one join + one aggregate, both shuffling on the
vertex id; label values only ever decrease, so convergence is
monotone and bounded by the graph diameter (≤ log₂ diameter with the
large-star optimization — plain propagation suffices for the dedup
graphs here, whose components are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) with component = min vertex id reachable.

    ``edges`` is undirected input (each pair listed once). Isolated
    vertices (absent from edges) are the caller's concern — union them
    in afterwards as their own component if needed.

    Raises ``RuntimeError`` if labels haven't converged after
    ``max_iter`` rounds (returning silently would split components
    whose diameter exceeds the iteration budget — wrong answers, not
    slow ones). Plain propagation needs O(diameter) rounds; raise
    ``max_iter`` for long-chain graphs.
    """
    # symmetrize via explode, NOT union of two selects: union would
    # evaluate the upstream edge plan twice (LSH/Jaccard pair generation
    # is the expensive part of every caller) — explode doubles rows in
    # a single pass over it
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .dropDuplicates()
        .persist()
    )
    # seed with min(self, direct neighbors) rather than self: near-dup
    # components are near-cliques, where this init IS already the
    # fixpoint — the loop then runs one confirming iteration instead of
    # O(diameter)+1. Same single shuffle as building plain labels.
    labels = (
        sym.groupBy(F.col("a").alias("vertex"))
        .agg(F.least(F.first("a"), F.min("b")).alias("component"))
        .persist()
    )
    converged = False
    for _ in range(max_iter):
        # each vertex adopts min(own, neighbors') component
        neighbor_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # localCheckpoint truncates lineage: `labels` feeds two joins per
        # iteration, so without it the logical plan DOUBLES each round
        # (2^iters nodes → driver OOM before the data is ever large).
        # On a cluster prefer reliable checkpoint() to survive executor loss.
        # The `changed` flag rides along so convergence detection is a
        # count over the checkpointed partitions — no extra join.
        # eager=False (r12): the convergence count() right below is the
        # first action anyway, so it materializes the checkpoint — one
        # job per iteration instead of two, identical blocks.
        new_labels = (
            labels.join(neighbor_min, on="vertex", how="left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component")) < F.col("component"))
                .cast("int")
                .alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("changed") == 1).count()
        labels.unpersist()
        labels = new_labels.select("vertex", "component")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter exceeds the budget) — raise max_iter"
        )
    return labels


def dup_groups_from_pairs(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    all_ids: DataFrame | None = None,
) -> DataFrame:
    """(doc, canonical) for every doc in a multi-doc near-dup group:
    canonical = min id of the connected component. Downstream dedup
    keeps rows where doc == canonical (or doc not in this frame).

    ``all_ids`` (single-column DataFrame of every document id) opts into
    TOTAL coverage: ids absent from ``pairs`` are unioned in as their
    own singleton component (canonical = self), so the result maps every
    document exactly once and a consumer can inner-join it without
    silently dropping clean docs. One anti-join on the id — no extra
    pass over the pair-generation pipeline."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    groups = comp.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("canonical_id")
    )
    if all_ids is not None:
        id_name = all_ids.columns[0]
        singletons = all_ids.select(
            F.col(id_name).alias("doc_id")
        ).join(groups, on="doc_id", how="left_anti").select(
            "doc_id", F.col("doc_id").alias("canonical_id")
        )
        groups = groups.unionByName(singletons)
    return groups
