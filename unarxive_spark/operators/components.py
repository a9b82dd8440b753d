"""Connected components via hash-min label exchange (north rule).

Weakly-connected components of the directed edge table: each vertex
carries a label (initially its own id); every superstep each vertex
adopts the min label among {itself} ∪ neighbors (both directions);
converges when no label changes. Deterministic: the final label of a
component is the lexicographic min conv_id in it — exactly what the
oracle (pure-Python union-find in tests) computes.

Superstep = one join (labels onto the undirected adjacency, partitioned
once) + one min-aggregation — the same gather-scatter shape as PageRank,
checkpointed per iteration for lineage/resume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.sources.checkpoint import CheckpointManager


@dataclass
class ComponentsResult:
    components: DataFrame  # conv_id, component
    iterations: int
    converged: bool


def undirected(edges: DataFrame) -> DataFrame:
    """Symmetrized distinct neighbor pairs (u, v) — both directions."""
    fwd = edges.select(
        F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
    )
    rev = edges.select(
        F.col("dst_conv_id").alias("u"), F.col("src_conv_id").alias("v")
    )
    return fwd.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    vertices: DataFrame | None = None,
    shortcut: bool = False,
) -> ComponentsResult:
    """``shortcut=True`` adds pointer jumping each superstep
    (label(v) ← label(label(v)), one self-join of the label table):
    min-labels then travel doubling distances, so convergence is
    O(log diameter) supersteps instead of O(diameter) — the variant the
    SCC coloring uses, where adversarial long-chain graphs would
    otherwise serialize. Off by default: on small-diameter citation
    graphs plain hash-min converges in a handful of rounds and the
    extra join per superstep is pure cost. The fixpoint (component =
    min conv_id) is identical either way."""
    spark = edges.sparkSession
    ckpt = CheckpointManager(spark, checkpoint_dir)

    if vertices is None:
        vertices = (
            edges.select(F.col("src_conv_id").alias("conv_id"))
            .unionByName(edges.select(F.col("dst_conv_id").alias("conv_id")))
            .distinct()
        )
    adj = undirected(edges).repartition("u").cache()
    adj.count()

    resumed = ckpt.last_committed()
    if resumed is not None:
        # older checkpoints carry 2 columns, newer ones also _old
        labels = ckpt.restore(resumed).select("conv_id", "component")
        start = resumed + 1
    else:
        labels = vertices.select(
            "conv_id", F.col("conv_id").alias("component")
        )
        start = 0

    converged = False
    it = start
    for it in range(start, max_iter):
        # neighbor-min: push each vertex's label to its neighbors; the
        # self leg doubles as the old-label carrier so the convergence
        # count is a column diff on the materialized state instead of a
        # second label-table join per superstep (guide §2.4)
        pushed = adj.join(
            labels.withColumnRenamed("conv_id", "u"), "u"
        ).select(
            F.col("v").alias("conv_id"),
            "component",
            F.lit(None)
            .cast(labels.schema["component"].dataType)
            .alias("_old"),
        )
        new_labels = (
            labels.select(
                "conv_id", "component", F.col("component").alias("_old")
            )
            .unionByName(pushed)
            .groupBy("conv_id")
            .agg(
                F.min("component").alias("component"),
                F.max("_old").alias("_old"),
            )
        )
        if shortcut:
            # label(v) ← label(label(v)): labels are vertex ids, so the
            # jump is an equi-join of the label table with itself; the
            # invariant label(x) ≤ x makes the jumped label the minimum
            new_labels = (
                new_labels.join(
                    new_labels.select(
                        F.col("conv_id").alias("component"),
                        F.col("component").alias("_jump"),
                    ),
                    "component",
                )
                .select(
                    "conv_id", F.col("_jump").alias("component"), "_old"
                )
            )
        # materialize once, then metric from the cheap re-scan
        new_m = ckpt.write_state(it, new_labels)
        n_changed = (
            new_m.filter(F.col("component") != F.col("_old")).count()
        )
        ckpt.log_lineage(it, new_m, "n_changed", float(n_changed))
        labels = new_m.select("conv_id", "component")
        if n_changed == 0:
            converged = True
            break

    return ComponentsResult(labels, it + 1, converged)
