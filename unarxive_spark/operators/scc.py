"""Strongly connected components (directed) — multi-pivot forward-
backward reachability (FW-BW), as DataFrame supersteps.

Round structure (classic distributed SCC, parallelized across regions):
  repeat on the remaining vertex set:
    trim    vertices with no live in- or out-edge inside their search
            region are singleton SCCs (labeled, removed)
    color   hash-min WCC over the live edges of each region → one part
            per weakly-connected piece (part label = min conv_id)
    pivot   one per part: the vertex minimizing (h64(id), id) — a
            deterministic PSEUDO-RANDOM member, so on a chain of SCCs
            the pivot lands mid-chain in expectation and the F/B/R
            split actually halves (a min-id pivot would sit at the
            head, making F cover everything and B nothing — serial)
    F, B    reachability from ALL pivots at once, keyed by (part, v);
            edges never cross parts, so one BFS superstep loop serves
            every part simultaneously
    F ∩ B   each pivot's SCC, labeled with the SCC's own min conv_id
            (per-part aggregate — matches the Tarjan oracle)
    split   survivors re-seed into part|F, part|B, part|R regions — by
            the FW-BW theorem no SCC spans these sets, so each region
            is searched independently next round

Rounds are therefore O(log #SCC)-ish instead of one-SCC-per-round: a
graph of k disjoint cycles resolves every cycle in a single round (one
pivot per weak component), and a chain of SCCs halves each round via the
F/B/R split. The trivial-SCC trim still collapses the long tail first.

Oracle: Tarjan in tests (labels = min conv_id of each SCC — exact).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64
from unarxive_spark.operators.components import connected_components


@dataclass
class SCCResult:
    components: DataFrame  # conv_id, component (min id in the SCC)
    pivot_rounds: int


def _reach_parts(
    adj: DataFrame, sources: DataFrame, max_hops: int
) -> DataFrame:
    """Vertices reachable from ``sources`` over adj(part, u, v),
    inclusive, searching every part simultaneously (frontier and visited
    sets are keyed by (part, conv_id); edges never cross parts).

    Raises if any frontier is still growing at ``max_hops`` — a silently
    truncated F/B set would mislabel SCCs with no error (mirrors the
    ``max_pivot_rounds`` RuntimeError)."""
    visited = sources
    frontier = sources
    for _ in range(max_hops):
        discovered = (
            adj.join(
                frontier.withColumnRenamed("conv_id", "u"), ["part", "u"]
            )
            .select("part", F.col("v").alias("conv_id"))
            .distinct()
            .join(visited, ["part", "conv_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if discovered.isEmpty():
            return visited
        visited = visited.unionByName(discovered).localCheckpoint(
            eager=True
        )
        frontier = discovered
    undiscovered = (
        adj.join(frontier.withColumnRenamed("conv_id", "u"), ["part", "u"])
        .select("part", F.col("v").alias("conv_id"))
        .distinct()
        .join(visited, ["part", "conv_id"], "left_anti")
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
    # remaining search state: vertex + its region seed; edges are only
    # followed between same-seed endpoints
    remaining = (
        fwd.select(F.col("u").alias("conv_id"))
        .unionByName(fwd.select(F.col("v").alias("conv_id")))
        .distinct()
        .select("conv_id", F.lit("0").alias("seed"))
        .localCheckpoint(eager=True)
    )
    labeled = spark.createDataFrame([], "conv_id string, component string")

    rounds = 0
    for rounds in range(1, max_pivot_rounds + 1):
        live = (
            fwd.join(
                remaining.select(
                    F.col("conv_id").alias("u"), F.col("seed").alias("_su")
                ),
                "u",
            )
            .join(
                remaining.select(
                    F.col("conv_id").alias("v"), F.col("seed").alias("_sv")
                ),
                "v",
            )
            .filter(F.col("_su") == F.col("_sv"))
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        # trim: remaining vertices with no live successor or no live
        # predecessor are singleton SCCs
        has_out = live.select(F.col("u").alias("conv_id")).distinct()
        has_in = live.select(F.col("v").alias("conv_id")).distinct()
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
        # re-restrict live to the surviving candidates so the coloring
        # never bridges regions through trimmed vertices
        live = (
            live.join(
                remaining.select(F.col("conv_id").alias("u")),
                "u",
                "left_semi",
            )
            .join(
                remaining.select(F.col("conv_id").alias("v")),
                "v",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        if live.isEmpty():
            # survivors lost all their edges to the trim; next round's
            # trim labels them as singletons
            continue

        # color: hash-min WCC of the live (seed-restricted) edges; seeds
        # partition the vertex set, so one WCC pass colors every region
        # and labels are globally-unique min conv_ids
        wcc = connected_components(
            live.select(
                F.col("u").alias("src_conv_id"),
                F.col("v").alias("dst_conv_id"),
            ),
            max_iter=max_hops,
            shortcut=True,  # O(log diameter) coloring — long chains of
            # SCCs must not serialize the round on label propagation
        )
        if not wcc.converged:
            raise RuntimeError(
                "SCC coloring (hash-min WCC) did not converge within "
                "max_hops; raise the bound"
            )
        part = wcc.components.select(
            "conv_id", F.col("component").alias("part")
        ).localCheckpoint(eager=True)
        # one pivot per part: hash-min member (partial-agg min of a
        # (h64, id) struct — no window, no skew on giant parts)
        pivots = (
            part.select(
                "part",
                F.struct(
                    h64(F.col("conv_id")).alias("hk"),
                    F.col("conv_id").alias("cid"),
                ).alias("_s"),
            )
            .groupBy("part")
            .agg(F.min("_s").alias("_s"))
            .select("part", F.col("_s.cid").alias("conv_id"))
        )
        adjp = live.join(
            part.withColumnRenamed("conv_id", "u"), "u"
        ).select("part", "u", "v").localCheckpoint(eager=True)
        fw = _reach_parts(adjp, pivots, max_hops)
        bw = _reach_parts(
            adjp.select(
                "part", F.col("v").alias("u"), F.col("u").alias("v")
            ),
            pivots,
            max_hops,
        )
        scc = fw.join(bw, ["part", "conv_id"]).localCheckpoint(eager=True)
        # the SCC's label is its own min conv_id (one partial-agg per
        # part — the pivot is pseudo-random, not the minimum)
        scc_lbl = scc.groupBy("part").agg(
            F.min("conv_id").alias("component")
        )
        labeled = labeled.unionByName(
            scc.join(scc_lbl, "part").select("conv_id", "component")
        ).localCheckpoint(eager=True)

        # split survivors into part|F / part|B / part|R regions (no SCC
        # spans these sets); vertices with no live edges keep their seed
        # and fall to next round's trim
        remaining = (
            remaining.join(scc.select("conv_id"), "conv_id", "left_anti")
            .join(part, "conv_id", "left")
            .join(
                fw.select("conv_id", F.lit(1).alias("_f")),
                "conv_id",
                "left",
            )
            .join(
                bw.select("conv_id", F.lit(1).alias("_b")),
                "conv_id",
                "left",
            )
            .select(
                "conv_id",
                F.when(
                    F.col("part").isNull(), F.col("seed")
                ).otherwise(
                    F.concat_ws(
                        "|",
                        "part",
                        F.when(F.col("_f") == 1, F.lit("F"))
                        .when(F.col("_b") == 1, F.lit("B"))
                        .otherwise(F.lit("R")),
                    )
                ).alias("seed"),
            )
            .localCheckpoint(eager=True)
        )
        if remaining.isEmpty():
            break

    fwd.unpersist()
    if not remaining.isEmpty():
        raise RuntimeError(
            "SCC did not converge within max_pivot_rounds; raise the bound"
        )
    return SCCResult(labeled, rounds)
