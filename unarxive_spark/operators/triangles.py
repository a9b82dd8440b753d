"""Triangle counting over the undirected graph.

Degree-ordered orientation (true node-iterator++, each triangle counted
exactly once): undirected distinct edges are oriented from the lower
``(degree, id)`` endpoint to the higher, then

    wedges  = E(x,y) ⋈ E(y,z)   (paths in orientation order)
    closed  = wedges ⋈ E(x,z)

Two shuffles. Orienting by (degree, id) — NOT lexicographic id — makes
every wedge pivot the *lowest-degree* vertex of its triangle, bounding
total wedges by Σ_e d_min(e) ≈ m^{3/2} instead of O(d_hub²) on a
power-law graph: a mega-hub has out-degree 0 under this orientation, so
it never pivots a wedge. Oracle: trace(A³)/6 on a dense numpy adjacency
in tests (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.operators.components import undirected


def canonical_edges(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """Undirected, deduped, oriented low→high.

    ``by_degree=True`` (default) orients by ``(degree, id)`` — the
    node-iterator++ order that bounds wedge fan-out on skewed graphs.
    ``by_degree=False`` is the plain lexicographic ``a < b`` orientation
    (same edge set, same triangle counts, hub-quadratic wedges — kept for
    the shape-comparison test).
    """
    und = undirected(edges)
    pairs = und.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    if not by_degree:
        return pairs
    deg = (
        pairs.select(F.col("a").alias("conv_id"))
        .unionByName(pairs.select(F.col("b").alias("conv_id")))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    with_deg = pairs.join(
        deg.select(F.col("conv_id").alias("a"), F.col("_deg").alias("_da")),
        "a",
    ).join(
        deg.select(F.col("conv_id").alias("b"), F.col("_deg").alias("_db")),
        "b",
    )
    # low (degree, id) endpoint first; id tie-break keeps it a total order
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    return with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("b"),
    )


def wedges(e: DataFrame) -> DataFrame:
    """Orientation-order 2-paths (x→y→z); the candidate set whose size
    the degree ordering bounds."""
    return (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )


def _closed_wedges(e: DataFrame) -> DataFrame:
    return wedges(e).join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
        "left_semi",
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles."""
    e = canonical_edges(edges).cache()
    n = _closed_wedges(e).count()
    e.unpersist()
    return n


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation count (conv_id, n_triangles)."""
    e = canonical_edges(edges).cache()
    per_vertex = (
        _closed_wedges(e)
        .select(F.explode(F.array("x", "y", "z")).alias("conv_id"))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_vertex
