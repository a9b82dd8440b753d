"""Label propagation (community detection) — deterministic synchronous
variant (north rule; SURVEY.md §5 "LPA is NOT deterministic under ties →
define deterministic tie-break (min label)").

Rule per superstep (synchronous; matched exactly by the pure-Python
oracle in tests):
- neighbor labels are counted over the **undirected** adjacency,
  weighted by edge weight (both directions carry the weight);
- new label = the label with max total weight; ties broken by **min
  label**; isolated vertices keep their label;
- fixed ``n_iter`` supersteps (synchronous LPA can oscillate on
  bipartite structures, so exact-match semantics pin the iteration
  count rather than a fixpoint).

Shape: join + two-stage agg (count by (vertex,label), then argmax via
max_by with a struct tie-break) — same partitioning story as PageRank.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.sources.checkpoint import CheckpointManager


@dataclass
class LPAResult:
    labels: DataFrame  # conv_id, label
    iterations: int


def _undirected_weighted(edges: DataFrame) -> DataFrame:
    fwd = edges.select(
        F.col("src_conv_id").alias("u"),
        F.col("dst_conv_id").alias("v"),
        "weight",
    )
    rev = edges.select(
        F.col("dst_conv_id").alias("u"),
        F.col("src_conv_id").alias("v"),
        "weight",
    )
    return (
        fwd.unionByName(rev)
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.sum("weight").alias("w"))
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    checkpoint_dir: str | None = None,
) -> LPAResult:
    spark = edges.sparkSession
    ckpt = CheckpointManager(spark, checkpoint_dir)

    vertices = (
        edges.select(F.col("src_conv_id").alias("conv_id"))
        .unionByName(edges.select(F.col("dst_conv_id").alias("conv_id")))
        .distinct()
    )
    adj = _undirected_weighted(edges).repartition("u").cache()
    adj.count()

    resumed = ckpt.last_committed()
    if resumed is not None:
        # older checkpoints carry 2 columns, newer ones also _old
        labels = ckpt.restore(resumed).select("conv_id", "label")
        start = resumed + 1
    else:
        labels = vertices.select("conv_id", F.col("conv_id").alias("label"))
        start = 0

    it = start
    for it in range(start, n_iter):
        # gather neighbor labels: v receives u's label with weight w
        received = adj.join(
            labels.withColumnRenamed("conv_id", "u"), "u"
        ).select(F.col("v").alias("conv_id"), "label", "w")
        tallies = received.groupBy("conv_id", "label").agg(
            F.sum("w").alias("tw")
        )
        # argmax weight, tie-break min label: max_by over (tw, reversed label)
        # implemented as max(struct(tw desc-proxy…)) — use min over struct
        # (negative weight, label) for a single deterministic pass.
        winner = tallies.groupBy("conv_id").agg(
            F.min(F.struct((-F.col("tw")).alias("nw"), F.col("label"))).alias(
                "m"
            )
        ).select("conv_id", F.col("m.label").alias("_win"))
        # the state rows ARE the vertex set (invariant from init), so
        # the winner left-joins onto the state directly — no vertices
        # re-join — and the carried old label makes the change count a
        # column diff on the materialized state instead of a second
        # label-table join per superstep (guide §2.4; the same fusion
        # as connected_components)
        new_labels = labels.join(winner, "conv_id", "left").select(
            "conv_id",
            F.coalesce(F.col("_win"), F.col("label")).alias("label"),
            F.col("label").alias("_old"),
        )
        new_m = ckpt.write_state(it, new_labels)
        n_changed = (
            new_m.filter(F.col("label") != F.col("_old")).count()
        )
        ckpt.log_lineage(it, new_m, "n_changed", float(n_changed))
        labels = new_m.select("conv_id", "label")

    return LPAResult(labels, it + 1 if n_iter > start else 0)


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 5,
    checkpoint_dir: str | None = None,
) -> LPAResult:
    """Semi-supervised LPA: ``seeds`` (conv_id, label) are ANCHORS whose
    labels never change; every other vertex starts unlabeled and adopts
    the weighted-majority label of its labeled neighbors each superstep
    (ties → min label, the repo-wide deterministic tie-break).

    The standard "propagate known categories through the citation
    graph" primitive: a handful of hand-labeled conversations color
    their graph neighborhoods.  Unreached vertices stay NULL rather
    than inventing a community — downstream filters can tell "no signal
    yet" from "labeled".

    Same per-superstep shape as plain LPA (one adjacency⋈labels join +
    two map-side-combinable aggs); the anchor override is a broadcast-
    sized left join, and convergence is label-change count == 0.
    """
    spark = edges.sparkSession
    ckpt = CheckpointManager(spark, checkpoint_dir)

    vertices = (
        edges.select(F.col("src_conv_id").alias("conv_id"))
        .unionByName(edges.select(F.col("dst_conv_id").alias("conv_id")))
        .distinct()
    )
    adj = _undirected_weighted(edges).repartition("u").cache()
    adj.count()
    anchors = seeds.select(
        "conv_id", F.col("label").alias("_seed")
    ).cache()

    labels = vertices.join(anchors, "conv_id", "left").select(
        "conv_id", F.col("_seed").alias("label")
    )

    it = 0
    for it in range(n_iter):
        received = adj.join(
            labels.filter(F.col("label").isNotNull()).withColumnRenamed(
                "conv_id", "u"
            ),
            "u",
        ).select(F.col("v").alias("conv_id"), "label", "w")
        tallies = received.groupBy("conv_id", "label").agg(
            F.sum("w").alias("tw")
        )
        winner = (
            tallies.groupBy("conv_id")
            .agg(
                F.min(
                    F.struct((-F.col("tw")).alias("nw"), F.col("label"))
                ).alias("m")
            )
            .select("conv_id", F.col("m.label").alias("_win"))
        )
        # state rows ARE the vertex set (init builds them from
        # vertices), so winner + anchors left-join onto the state
        # directly — no vertices re-join — and the carried old label
        # fuses the change count into a column diff on the
        # materialized state (guide §2.4)
        new_labels = (
            labels.select(
                "conv_id", F.col("label").alias("_old")
            )
            .join(winner, "conv_id", "left")
            .join(anchors, "conv_id", "left")
            .select(
                "conv_id",
                F.coalesce(F.col("_seed"), F.col("_win")).alias("label"),
                "_old",
            )
        )
        new_m = ckpt.write_state(it, new_labels)
        n_changed = (
            new_m.filter(
                ~F.col("label").eqNullSafe(F.col("_old"))
            ).count()
        )
        ckpt.log_lineage(it, new_m, "n_changed", float(n_changed))
        labels = new_m.select("conv_id", "label")
        if n_changed == 0:
            break
    anchors.unpersist()
    adj.unpersist()
    return LPAResult(labels=labels, iterations=it + 1)
