"""k-core decomposition (undirected) as peel supersteps.

The k-core is the maximal subgraph where every vertex has degree ≥ k —
the standard "dense-kernel" filter for citation networks (drop the long
tail, keep the interlinked core). Peeling is a fixpoint loop with the
same shape as the other supersteps: degrees → filter → semi-join edge
shrink, localCheckpoint per round to truncate lineage.

Rounds needed = peel depth (≤ |V| worst case, tiny in practice: each
round removes EVERY vertex under the threshold simultaneously). At
100 TB each round is one aggregation + two semi-joins over the shrinking
edge set — no collects besides the loop-control count.

Oracle: pure-Python peeling in tests (exact vertex sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unarxive_spark.operators.components import undirected


def k_core(
    edges: DataFrame, k: int, max_rounds: int = 100
) -> DataFrame:
    """Vertices of the k-core: (conv_id) — empty when no k-core exists.

    Raises if the peel has not reached the fixpoint within
    ``max_rounds`` (same no-silent-truncation contract as SCC/SSSP).
    """
    und = (
        undirected(edges)
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.filter(F.col("_d") >= k).select("u")
        n_before = und.count()
        und = (
            und.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        if und.count() == n_before:
            return und.select(F.col("u").alias("conv_id")).distinct()
    raise RuntimeError(
        f"k-core peel did not converge within max_rounds={max_rounds}"
    )


def core_numbers(edges: DataFrame, max_rounds: int = 100) -> DataFrame:
    """(conv_id, core int): the largest k whose k-core contains the
    vertex — ALL core values in one superstep loop (no per-k peeling).

    Single-pass h-index propagation (Lü et al. 2016, "The H-index of a
    network node and its relation to degree and coreness"): start every
    vertex at est = degree, then repeat

        est(v) ← h-index of { est(u) : u ∈ N(v) }

    The sequence is pointwise non-increasing and its fixpoint is exactly
    the coreness vector, so rounds are bounded by how fast estimates
    settle (typically a handful) — independent of k_max, which the
    previous implementation looped over sequentially.

    Per round the whole graph does ONE join + ONE partial-agg groupBy;
    the h-index itself avoids collect_list entirely:

        h(v) = max over distinct capped values c of min(c, run(c)),
        run(c) = #neighbors with min(est(u), est(v)) ≥ c

    Capping each neighbor value at est(v) is value-preserving (the true
    h never exceeds est(v)) and bounds the per-vertex window to
    ≤ est(v) DISTINCT rows — a mega-hub contributes its grouped count
    rows, never its raw adjacency list, so no single task sorts a hub's
    neighborhood. Raises if the fixpoint is not reached in
    ``max_rounds`` (no silent truncation — same contract as k_core/SCC).
    """
    und = (
        undirected(edges).select("u", "v").distinct().localCheckpoint(
            eager=True
        )
    )
    est = (
        und.groupBy("u")
        .agg(F.count(F.lit(1)).cast("int").alias("est"))
        .withColumnRenamed("u", "conv_id")
        .localCheckpoint(eager=True)
    )
    total = est.agg(F.sum("est")).collect()[0][0]
    if total is None:
        return est.select("conv_id", F.col("est").alias("core"))
    run_w = (
        Window.partitionBy("u")
        .orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for _ in range(max_rounds):
        nb = (
            und.join(
                est.select(
                    F.col("conv_id").alias("v"), F.col("est").alias("_ev")
                ),
                "v",
            )
            .join(
                est.select(
                    F.col("conv_id").alias("u"), F.col("est").alias("_eu")
                ),
                "u",
            )
            .select("u", F.least("_ev", "_eu").alias("c"))
        )
        cnt = nb.groupBy("u", "c").agg(F.count(F.lit(1)).alias("_n"))
        h = (
            cnt.withColumn("_run", F.sum("_n").over(run_w))
            .groupBy("u")
            .agg(
                F.max(F.least(F.col("c").cast("long"), F.col("_run")))
                .cast("int")
                .alias("_h")
            )
        )
        est = (
            est.join(h.withColumnRenamed("u", "conv_id"), "conv_id")
            .select("conv_id", F.least("est", "_h").alias("est"))
            .localCheckpoint(eager=True)
        )
        new_total = est.agg(F.sum("est")).collect()[0][0]
        if new_total == total:  # monotone non-increasing → fixpoint
            return est.select("conv_id", F.col("est").alias("core"))
        total = new_total
    raise RuntimeError(
        f"core_numbers h-index propagation did not converge within "
        f"max_rounds={max_rounds}"
    )
