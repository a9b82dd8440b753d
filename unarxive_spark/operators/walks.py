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


def _summed_weight_edges(edges: DataFrame, weight_col: str) -> DataFrame:
    """(src, dst, _w long): parallel edges collapsed by weight sum.

    Weights must be positive integers (edge weights here are marker
    counts, SURVEY §1.1.3) so the modular pick stays in exact integer
    arithmetic — a fractional weight raises in-plan rather than silently
    rounding."""
    w_sum = F.sum(weight_col).alias("__wraw")
    e = edges.groupBy(
        F.col("src_conv_id").alias("src"),
        F.col("dst_conv_id").alias("dst"),
    ).agg(w_sum)
    w_long = F.col("__wraw").cast("long")
    ok = F.assert_true(
        (F.col("__wraw") == w_long.cast("double")) & (w_long >= 1),
        F.lit(
            "random_walks: weights must be positive integers "
            "(got a fractional or non-positive weight)"
        ),
    )
    return e.select(
        "src", "dst", F.when(ok.isNull(), w_long).alias("_w")
    )


def _weighted_ranked_edges(edges: DataFrame, weight_col: str) -> DataFrame:
    """(src, dst, _w, _wcum, _wtot): out-edges with an EXCLUSIVE
    cumulative-weight prefix in the deterministic (shard, dst) order —
    edge i owns the pick range [_wcum, _wcum + _w).

    Same two-stage de-skew as the uniform rank: per-shard prefix sums
    within (src, shard), then a <= N_RANK_SHARDS-row offset window per
    src — no single-task mega-hub sort."""
    e = _summed_weight_edges(edges, weight_col).withColumn(
        "_sh", F.pmod(h64(F.col("dst")), F.lit(N_RANK_SHARDS))
    )
    w_in = (
        Window.partitionBy("src", "_sh")
        .orderBy("dst")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn(
        "_wrk_in", F.coalesce(F.sum("_w").over(w_in), F.lit(0))
    )
    sizes = e.groupBy("src", "_sh").agg(F.sum("_w").alias("_n"))
    w_off = (
        Window.partitionBy("src")
        .orderBy("_sh")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "src",
        "_sh",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_woff"),
        F.sum("_n").over(Window.partitionBy("src")).alias("_wtot"),
    )
    return e.join(offs, ["src", "_sh"]).select(
        "src",
        "dst",
        "_w",
        (F.col("_wrk_in") + F.col("_woff")).alias("_wcum"),
        "_wtot",
        "_sh",
    )


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
    weight_col: str | None = None,
) -> DataFrame:
    """→ (walk_id, step, conv_id): one row per visited vertex.

    ``starts``: (conv_id) start vertices; each spawns
    ``walks_per_vertex`` walks (walk_id = ``conv_id#i``). ``step`` runs
    0..walk_length (or stops early at a vertex with no out-edges).

    With ``weight_col`` the successor is picked WEIGHT-PROPORTIONALLY:
    the hash is reduced modulo the total out-weight and the edge whose
    cumulative-weight range [_wcum, _wcum + _w) contains it wins — the
    same deterministic h64 pick, against prefix-sum ranges instead of
    the unit rank (integer weights only; exact modular arithmetic)."""
    weighted = weight_col is not None
    if weighted:
        ranked = (
            _weighted_ranked_edges(edges, weight_col)
            .repartition("src")
            .cache()
        )
    else:
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
        h = h64(
            F.concat_ws(
                "|", F.lit(str(seed)), "walk_id", F.lit(str(step))
            )
        )
        if weighted:
            pick = F.pmod(h, F.col("_wtot"))
            hit = (pick >= F.col("_wcum")) & (
                pick < F.col("_wcum") + F.col("_w")
            )
        else:
            hit = F.col("_rk") == F.pmod(h, F.col("_deg"))
        frontier = (
            frontier.select("walk_id", F.col("cur").alias("src"))
            .join(ranked, "src")  # dangling cur → no row → walk stops
            .filter(hit)
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


def node2vec_walks(
    edges: DataFrame,
    starts: DataFrame,
    walk_length: int = 5,
    walks_per_vertex: int = 1,
    seed: int = 42,
    ret_bias: int = 1,
    adj_bias: int = 1,
    far_bias: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Second-order (node2vec, Grover & Leskovec KDD 2016) biased walks
    → (walk_id, step, conv_id).

    The successor distribution at ``cur`` depends on the PREVIOUS vertex:
    candidate ``dst`` gets bias ``ret_bias`` if ``dst == prev`` (∝ 1/p),
    ``adj_bias`` if the edge ``prev → dst`` exists (distance 1, ∝ 1),
    else ``far_bias`` (∝ 1/q) — integer biases so the modular pick stays
    exact (scale p/q to a common integer denominator).  Step 1 has no
    previous vertex and is plain weight-proportional (bias 1).

    Spark shape: second-order bias makes the normalizer PER-WALK (it
    depends on prev), so each step windows the candidate set — the same
    two-stage (walk_id, shard) prefix-sum de-skew as the adjacency rank,
    keeping a mega-hub's candidates out of any single window task.  One
    extra broadcast-or-shuffle left join per step marks the
    distance-1 candidates against the edge set.
    """
    if min(ret_bias, adj_bias, far_bias) < 1:
        raise ValueError("biases must be positive integers")
    if weight_col is None:
        adj = (
            edges.select(
                F.col("src_conv_id").alias("src"),
                F.col("dst_conv_id").alias("dst"),
            )
            .distinct()
            .withColumn("_w", F.lit(1).cast("long"))
        )
    else:
        # biases recompute per-step prefixes anyway — only the summed
        # weights are needed, not the ranked prefix columns (ADVICE r4)
        adj = _summed_weight_edges(edges, weight_col)
    adj = (
        adj.withColumn(
            "_sh", F.pmod(h64(F.col("dst")), F.lit(N_RANK_SHARDS))
        )
        .repartition("src")
        .cache()
    )
    eset = (
        adj.select(
            F.col("src").alias("prev"), "dst", F.lit(1).alias("_adj")
        )
        .distinct()
        .cache()
    )
    walk_ids = starts.select(
        F.explode(
            F.array(
                *[
                    F.concat_ws("#", "conv_id", F.lit(str(i)))
                    for i in range(walks_per_vertex)
                ]
            )
        ).alias("walk_id"),
        F.col("conv_id").alias("cur"),
    )
    frontier = walk_ids.select(
        "walk_id",
        F.lit(0).alias("step"),
        "cur",
        F.lit(None).cast("string").alias("prev"),
    ).localCheckpoint(eager=True)
    out = frontier
    for step in range(1, walk_length + 1):
        cand = (
            frontier.select(
                "walk_id", F.col("cur").alias("src"), "prev"
            )
            .join(adj, "src")
            .join(eset, ["prev", "dst"], "left")
        )
        alpha = (
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("dst") == F.col("prev"), F.lit(int(ret_bias)))
            .when(F.col("_adj") == 1, F.lit(int(adj_bias)))
            .otherwise(F.lit(int(far_bias)))
        ).cast("long")
        cand = cand.withColumn("_aw", F.col("_w") * alpha)
        w_in = (
            Window.partitionBy("walk_id", "_sh")
            .orderBy("dst")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cand = cand.withColumn(
            "_cum_in", F.coalesce(F.sum("_aw").over(w_in), F.lit(0))
        )
        sizes = cand.groupBy("walk_id", "_sh").agg(
            F.sum("_aw").alias("_n")
        )
        w_off = (
            Window.partitionBy("walk_id")
            .orderBy("_sh")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = sizes.select(
            "walk_id",
            "_sh",
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
            F.sum("_n").over(Window.partitionBy("walk_id")).alias("_tot"),
        )
        pick = F.pmod(
            h64(
                F.concat_ws(
                    "|", F.lit(str(seed)), "walk_id", F.lit(str(step))
                )
            ),
            F.col("_tot"),
        )
        cum = F.col("_cum_in") + F.col("_off")
        frontier = (
            cand.join(offs, ["walk_id", "_sh"])
            .filter((pick >= cum) & (pick < cum + F.col("_aw")))
            .select(
                "walk_id",
                F.lit(step).alias("step"),
                F.col("dst").alias("cur"),
                F.col("src").alias("prev"),
            )
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break
        out = out.unionByName(frontier)
    adj.unpersist()
    eset.unpersist()
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
