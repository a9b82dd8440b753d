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

from pyspark.sql import DataFrame
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


def core_numbers(
    edges: DataFrame, k_max: int = 64, max_rounds: int = 100
) -> DataFrame:
    """(conv_id, core int): the largest k whose k-core contains the
    vertex. Loops k upward reusing each k-core's edge set as the next
    peel's input (monotonicity), stopping at the first empty core.
    """
    spark = edges.sparkSession
    und = (
        undirected(edges).select("u", "v").distinct().localCheckpoint(
            eager=True
        )
    )
    result = (
        und.select(F.col("u").alias("conv_id"))
        .distinct()
        .select("conv_id", F.lit(0).alias("core"))
        .localCheckpoint(eager=True)
    )
    for k in range(1, k_max + 1):
        # peel within the previous core's subgraph (monotone shrink)
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
                break
        else:
            raise RuntimeError(
                f"k-core peel (k={k}) did not converge within "
                f"max_rounds={max_rounds}"
            )
        members = und.select(F.col("u").alias("conv_id")).distinct()
        if members.isEmpty():
            return result
        result = (
            result.join(
                members.withColumn("_in", F.lit(1)), "conv_id", "left"
            )
            .select(
                "conv_id",
                F.when(F.col("_in") == 1, F.lit(k))
                .otherwise(F.col("core"))
                .alias("core"),
            )
            .localCheckpoint(eager=True)
        )
    return result
