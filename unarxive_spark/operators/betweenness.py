"""Betweenness centrality — k-source Brandes over supersteps.

Brandes (2001, "A faster algorithm for betweenness centrality") from a
deterministic pivot subset (Brandes & Pich 2007 show source-sampling
estimates scale to large graphs; exact when every vertex is a source).
The citation-graph use: find broker conversations that sit on many
shortest reference chains — the one centrality the suite (degree,
PageRank/PPR, HITS, harmonic) did not yet cover.

Spark-first shape:
- ALL sources advance simultaneously: state is keyed by
  ``(src, vertex)`` — the same multi-source trick as the SCC F/B sweeps
  (one join serves every source per superstep, k never multiplies the
  superstep count).
- Forward phase: unweighted BFS supersteps accumulating sigma (number
  of shortest paths); each level is ONE join frontier⋈adjacency + ONE
  partial-agg groupBy (sum of parent sigmas) + ONE anti-join against
  the settled set.  Levels are retained (they are small per-level
  slices of the settled state) for the backward sweep.
- Backward phase: for d = deepest..1, dependency
  ``delta(v) += sigma(v)/sigma(w) * (1 + delta(w))`` over tree edges
  (v at d-1) -> (w at d): again one join + one groupBy per level.
- ``bc(v) = sum over sources of delta`` (endpoints excluded, directed
  convention; no 1/2 factor).

Sources default to the k smallest ``(h64(conv_id), conv_id)`` vertices
— a deterministic, content-addressed sample both the pure-Python oracle
and any external replay can reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64

__all__ = ["betweenness"]


def _local_ckpt(df: DataFrame) -> DataFrame:
    # the forward phase grows lineage level by level — truncate eagerly
    return df.localCheckpoint(eager=True)


def betweenness(
    edges: DataFrame,
    sources: list[str] | None = None,
    k_sources: int | None = None,
    max_depth: int = 40,
) -> DataFrame:
    """``(conv_id, bc double)`` — betweenness restricted to shortest
    paths starting at the chosen sources (exact Brandes when sources
    cover all vertices).  Raises if any BFS is still expanding at
    ``max_depth`` (no silent truncation)."""
    adj = (
        edges.select(
            F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .repartition("u")
        .cache()
    )
    adj.count()
    verts = (
        adj.select(F.col("u").alias("conv_id"))
        .unionByName(adj.select(F.col("v").alias("conv_id")))
        .distinct()
    )

    if sources is None:
        k = k_sources or 8
        src_df = (
            verts.orderBy(h64(F.col("conv_id")).asc(), F.col("conv_id").asc())
            .limit(k)
            .select(F.col("conv_id").alias("s"))
        )
    else:
        spark = edges.sparkSession
        src_df = spark.createDataFrame(
            [(s,) for s in sources], "s string"
        )
    src_df = F.broadcast(src_df)

    # settled: (s, v, dist, sigma)
    frontier = _local_ckpt(
        src_df.select(
            "s",
            F.col("s").alias("v"),
            F.lit(0).alias("dist"),
            F.lit(1.0).alias("sigma"),
        )
    )
    levels: list[DataFrame] = [frontier]
    settled = frontier
    depth = 0
    while True:
        if depth >= max_depth:
            raise RuntimeError(
                f"betweenness: BFS still expanding at depth {max_depth}"
            )
        expanded = (
            frontier.join(adj, frontier.v == adj.u)
            .select("s", adj.v.alias("v"), "sigma")
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = _local_ckpt(
            expanded.join(
                settled.select("s", "v"), ["s", "v"], "left_anti"
            ).select("s", "v", F.lit(depth + 1).alias("dist"), "sigma")
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        settled = _local_ckpt(settled.unionByName(nxt))
        frontier = nxt
        depth += 1

    # backward sweep: delta flows from level d to its tree parents at
    # d-1.  Tree edges = adjacency restricted to consecutive levels of
    # the same source's BFS.
    delta = levels[-1].select(
        "s", "v", F.lit(0.0).alias("delta")
    )
    acc: DataFrame | None = None
    for d in range(len(levels) - 1, 0, -1):
        child = levels[d].select("s", "v", "sigma").join(
            delta, ["s", "v"], "left"
        ).select(
            "s",
            F.col("v").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.coalesce("delta", F.lit(0.0)).alias("delta_w"),
        )
        parent = levels[d - 1].select(
            "s", F.col("v").alias("u"), F.col("sigma").alias("sigma_u")
        )
        contrib = (
            child.join(adj, child.w == adj.v)
            .select("s", adj.u.alias("u"), "sigma_w", "delta_w")
            .join(parent, ["s", "u"])
            .groupBy("s", "u")
            .agg(
                F.sum(
                    F.col("sigma_u")
                    / F.col("sigma_w")
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("delta")
            )
            .select("s", F.col("u").alias("v"), "delta")
        )
        contrib = _local_ckpt(contrib)
        # delta for level d-1 vertices (used next iteration as child
        # deltas); sources themselves accumulate but are excluded below
        delta = contrib
        not_source = contrib.filter(F.col("v") != F.col("s"))
        acc = (
            not_source
            if acc is None
            else _local_ckpt(acc.unionByName(not_source))
        )

    if acc is None:
        return verts.select("conv_id", F.lit(0.0).alias("bc"))
    bc = acc.groupBy("v").agg(F.sum("delta").alias("bc"))
    return (
        verts.join(bc, verts.conv_id == bc.v, "left")
        .select(
            "conv_id", F.coalesce("bc", F.lit(0.0)).alias("bc")
        )
    )
