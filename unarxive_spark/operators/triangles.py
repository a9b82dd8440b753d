"""Triangle counting over the undirected graph.

Canonical-ordering join strategy (each triangle counted exactly once):
undirected distinct edges are oriented ``a < b`` (string order), then

    wedges  = E(a,b) ⋈ E(b,c)   with a < b < c
    closed  = wedges ⋈ E(a,c)

Two shuffles; the canonical orientation halves the edge list and makes
the heavy hitter of the wedge join the *low-degree* endpoint in
expectation (classic node-iterator++). Oracle: trace(A³)/6 on a dense
numpy adjacency in tests (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.operators.components import undirected


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected, deduped, oriented a < b."""
    und = undirected(edges)
    return und.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles."""
    e = canonical_edges(edges).cache()
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    closed = wedges.join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
        "left_semi",
    )
    n = closed.count()
    e.unpersist()
    return n


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation count (conv_id, n_triangles)."""
    e = canonical_edges(edges).cache()
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    closed = wedges.join(
        e.alias("e3"),
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
        "left_semi",
    )
    per_vertex = (
        closed.select(F.explode(F.array("x", "y", "z")).alias("conv_id"))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_vertex
