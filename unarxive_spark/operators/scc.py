"""Strongly connected components (directed) — pivot forward-backward
reachability (FW-BW), as DataFrame supersteps.

Algorithm (classic distributed SCC):
  repeat on the remaining vertex set:
    pivot   = min conv_id remaining (deterministic)
    F       = vertices reachable from pivot      (BFS supersteps)
    B       = vertices reaching pivot            (BFS on reversed edges)
    F ∩ B   = pivot's SCC → labeled with the component's min conv_id
    remove the SCC; vertices with no remaining edges are singletons
  until nothing remains.

Rounds = number of SCCs touched by pivots — fine when a few large SCCs
dominate (hub-heavy citation graphs). Trivial SCC trimming (vertices
with in-degree or out-degree 0 inside the remaining set are singleton
SCCs) runs before each pivot round, which collapses the long tail fast.

Oracle: Tarjan in tests (labels = min conv_id of each SCC — exact).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SCCResult:
    components: DataFrame  # conv_id, component (min id in the SCC)
    pivot_rounds: int


def _reach(adj: DataFrame, sources: DataFrame, max_hops: int) -> DataFrame:
    """Vertex set reachable from ``sources`` over adj(u, v), inclusive.

    Raises if the frontier is still growing at ``max_hops`` — a silently
    truncated F/B set would mislabel SCCs with no error (mirrors the
    ``max_pivot_rounds`` RuntimeError)."""
    visited = sources
    frontier = sources
    for _ in range(max_hops):
        discovered = (
            adj.join(frontier.withColumnRenamed("conv_id", "u"), "u")
            .select(F.col("v").alias("conv_id"))
            .distinct()
            .join(visited, "conv_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if discovered.isEmpty():
            return visited
        visited = visited.unionByName(discovered).localCheckpoint(
            eager=True
        )
        frontier = discovered
    undiscovered = (
        adj.join(frontier.withColumnRenamed("conv_id", "u"), "u")
        .select(F.col("v").alias("conv_id"))
        .distinct()
        .join(visited, "conv_id", "left_anti")
    )
    if not undiscovered.isEmpty():
        raise RuntimeError(
            "SCC reachability did not close within max_hops; raise the "
            "bound (graph diameter exceeds it)"
        )
    return visited


def strongly_connected_components(
    edges: DataFrame,
    max_pivot_rounds: int = 200,
    max_hops: int = 100,
) -> SCCResult:
    spark = edges.sparkSession
    fwd = (
        edges.select(
            F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    remaining = (
        fwd.select(F.col("u").alias("conv_id"))
        .unionByName(fwd.select(F.col("v").alias("conv_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labeled = spark.createDataFrame([], "conv_id string, component string")

    rounds = 0
    for rounds in range(1, max_pivot_rounds + 1):
        # trim: remaining vertices with no remaining successor or no
        # remaining predecessor are singleton SCCs
        live_fwd = (
            fwd.join(remaining.withColumnRenamed("conv_id", "u"), "u", "left_semi")
            .join(remaining.withColumnRenamed("conv_id", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        has_out = live_fwd.select(F.col("u").alias("conv_id")).distinct()
        has_in = live_fwd.select(F.col("v").alias("conv_id")).distinct()
        # only vertices with BOTH live in- and out-edges can sit on a cycle
        candidates = remaining.join(has_out, "conv_id", "left_semi").join(
            has_in, "conv_id", "left_semi"
        )
        trivial = remaining.join(candidates, "conv_id", "left_anti")
        labeled = labeled.unionByName(
            trivial.select("conv_id", F.col("conv_id").alias("component"))
        ).localCheckpoint(eager=True)
        remaining = candidates.localCheckpoint(eager=True)
        if remaining.isEmpty():
            break

        pivot = remaining.agg(F.min("conv_id").alias("conv_id"))
        fw = _reach(live_fwd, pivot, max_hops)
        bw = _reach(
            live_fwd.select(F.col("v").alias("u"), F.col("u").alias("v")),
            pivot,
            max_hops,
        )
        scc = fw.join(bw, "conv_id").localCheckpoint(eager=True)
        label = scc.agg(F.min("conv_id").alias("component"))
        labeled = labeled.unionByName(
            scc.crossJoin(F.broadcast(label))
        ).localCheckpoint(eager=True)
        remaining = remaining.join(scc, "conv_id", "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.isEmpty():
            break

    fwd.unpersist()
    if not remaining.isEmpty():
        raise RuntimeError(
            "SCC did not converge within max_pivot_rounds; raise the bound"
        )
    return SCCResult(labeled, rounds)
