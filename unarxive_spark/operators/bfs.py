"""BFS hop distances / k-hop neighborhoods over the directed edge table.

Frontier-expansion supersteps (the same join/agg shape as the other L3
operators, checkpointable): each round joins the frontier to the
adjacency, keeps newly discovered vertices, records their distance.
Terminates when the frontier empties — at most diameter rounds.

Scale shape: the frontier is usually tiny relative to the edge table, so
the per-round join broadcasts the frontier against the cached
co-partitioned adjacency; visited-set membership is a left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.sources.checkpoint import CheckpointManager


def bfs_distances(
    edges: DataFrame,
    sources: list[str],
    max_hops: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """→ (conv_id, distance) for every vertex reachable from ``sources``
    within ``max_hops`` directed hops (distance 0 = the sources)."""
    spark = edges.sparkSession
    ckpt = CheckpointManager(spark, checkpoint_dir)
    adj = (
        edges.select(
            F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
        )
        .distinct()
        .repartition("u")
        .cache()
    )
    visited = spark.createDataFrame(
        [(s, 0) for s in sources], "conv_id string, distance int"
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        discovered = (
            adj.join(
                frontier.withColumnRenamed("conv_id", "u"),
                "u",
            )
            .select(F.col("v").alias("conv_id"))
            .distinct()
            .join(visited, "conv_id", "left_anti")
            .withColumn("distance", F.lit(hop))
        )
        discovered = ckpt.write_state(hop, discovered)
        n_new = discovered.count()
        ckpt.log_lineage(hop, discovered, "n_discovered", float(n_new))
        if n_new == 0:
            break
        visited = visited.unionByName(discovered).localCheckpoint(
            eager=True
        )
        frontier = discovered
    adj.unpersist()
    return visited


def k_hop_neighbors(
    edges: DataFrame, sources: list[str], k: int
) -> DataFrame:
    """Vertices within exactly ≤ k hops (sources excluded)."""
    d = bfs_distances(edges, sources, max_hops=k)
    return d.filter(F.col("distance") > 0).select("conv_id", "distance")
