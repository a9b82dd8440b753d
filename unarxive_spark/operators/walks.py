"""Deterministic random-walk sampling — the graph-embedding corpus
generator (DeepWalk/node2vec input) for training-data pipelines.

Each walk step is a join, not a UDF: the walk state ``(walk_id, step,
cur)`` joins the out-edge table; the "random" successor is picked by the
portable hash ``h64(walk_id|step) % out_degree(cur)`` against a
precomputed per-source edge rank — fully deterministic, partition- and
engine-independent (the same discipline as the hash-bucket split: no
``rand()``, reruns reproduce the corpus bit-for-bit, which checkpoints
and resume depend on).

Scale shape: the edge table is ranked/cached once; each step shuffles
only the walk frontier (|walks| rows) to the edge layout — identical
dataflow to the PageRank superstep. Walks that reach a dangling vertex
stop early (standard DeepWalk semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64


# shards for the de-skewed adjacency rank: a mega-hub's out-edges sort
# in N_RANK_SHARDS independent tasks instead of one
N_RANK_SHARDS = 16


def _ranked_edges(edges: DataFrame) -> DataFrame:
    """(src, dst, _rk, _deg): out-edges ranked 0..deg-1 per source in a
    deterministic order, with the out-degree attached.

    Skew-safe two-stage rank: a plain ``row_number() over (partition by
    src order by dst)`` sorts a mega-hub's ENTIRE adjacency list in one
    task (windows don't AQE-split). Instead each edge is sharded by
    ``h64(dst) % N_RANK_SHARDS``, ranked within its (src, shard) window,
    then offset by the prefix sum of shard sizes — the offset window runs
    over ≤ N_RANK_SHARDS rows per src. The resulting global order is
    (shard, dst): still fully deterministic and engine-portable (the
    replay oracle and the DuckDB driver oracle order the same way), just
    not plain lexicographic.
    """
    e = (
        edges.select(
            F.col("src_conv_id").alias("src"),
            F.col("dst_conv_id").alias("dst"),
        )
        .distinct()
        .withColumn("_sh", F.pmod(h64(F.col("dst")), F.lit(N_RANK_SHARDS)))
    )
    w_in = Window.partitionBy("src", "_sh").orderBy("dst")
    e = e.withColumn("_rk_in", F.row_number().over(w_in) - 1)
    sizes = e.groupBy("src", "_sh").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy("src")
        .orderBy("_sh")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "src",
        "_sh",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_n").over(Window.partitionBy("src")).alias("_deg"),
    )
    return e.join(offs, ["src", "_sh"]).select(
        "src", "dst", (F.col("_rk_in") + F.col("_off")).alias("_rk"), "_deg"
    )


def random_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_length: int = 5,
    walks_per_vertex: int = 1,
    seed: int = 42,
) -> DataFrame:
    """→ (walk_id, step, conv_id): one row per visited vertex.

    ``starts``: (conv_id) start vertices; each spawns
    ``walks_per_vertex`` walks (walk_id = ``conv_id#i``). ``step`` runs
    0..walk_length (or stops early at a vertex with no out-edges).
    """
    ranked = _ranked_edges(edges).repartition("src").cache()
    walk_ids = starts.select(
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#", "conv_id", F.lit(str(i))
                    )
                    for i in range(walks_per_vertex)
                ]
            )
        ).alias("walk_id"),
        F.col("conv_id").alias("cur"),
    )
    frontier = walk_ids.select(
        "walk_id", F.lit(0).alias("step"), "cur"
    ).localCheckpoint(eager=True)
    out = frontier
    for step in range(1, walk_length + 1):
        pick = F.pmod(
            h64(
                F.concat_ws(
                    "|", F.lit(str(seed)), "walk_id", F.lit(str(step))
                )
            ),
            F.col("_deg"),
        )
        frontier = (
            frontier.select("walk_id", F.col("cur").alias("src"))
            .join(ranked, "src")  # dangling cur → no row → walk stops
            .filter(F.col("_rk") == pick)
            .select(
                "walk_id",
                F.lit(step).alias("step"),
                F.col("dst").alias("cur"),
            )
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        out = out.unionByName(frontier)
    ranked.unpersist()
    return out.select("walk_id", "step", F.col("cur").alias("conv_id"))


def walk_corpus(walks: DataFrame) -> DataFrame:
    """(walk_id, sentence): each walk as an ordered vertex sequence —
    the skip-gram training corpus (array_sort on (step, vertex) structs
    keeps it deterministic without a window)."""
    return (
        walks.groupBy("walk_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("step", "conv_id"))
            ).alias("_s")
        )
        .select(
            "walk_id",
            F.transform("_s", lambda s: s["conv_id"]).alias("sentence"),
        )
    )
