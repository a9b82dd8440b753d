"""Community modularity (Newman) over a label assignment.

Q = Σ_c [ m_c/m − (Σ_c degrees / 2m)² ] on the undirected weighted
view — quantifies how good an LPA/CC partition is. Pure join/agg:
one pass over edges for in-community weight, one per-vertex degree agg.
Oracle: dict arithmetic in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.operators.lpa import _undirected_weighted


def modularity_df(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity as a 1-row DataFrame (``modularity`` double) —
    fully plan-side (three aggregates cross-joined), no driver collects,
    so it composes into larger plans and the driver oracle contract."""
    und = _undirected_weighted(edges)  # (u, v, w) both directions
    lab_u = labels.select(
        F.col("conv_id").alias("u"), F.col("label").alias("lu")
    )
    lab_v = labels.select(
        F.col("conv_id").alias("v"), F.col("label").alias("lv")
    )
    # 2m = total undirected weight (each edge counted twice in `und`)
    two_m = und.agg(F.sum("w").alias("_tm"))
    # in-community weight (both directions counted → already 2·w_in)
    w_in = (
        und.join(lab_u, "u")
        .join(lab_v, "v")
        .filter(F.col("lu") == F.col("lv"))
        .agg(F.coalesce(F.sum("w"), F.lit(0.0)).alias("_wi"))
    )
    # per-community degree sums: deg(v) = Σ incident weight
    deg = und.groupBy("u").agg(F.sum("w").alias("deg"))
    sq = (
        deg.join(lab_u, "u")
        .groupBy("lu")
        .agg(F.sum("deg").alias("d"))
        .agg(F.coalesce(F.sum(F.col("d") * F.col("d")), F.lit(0.0)).alias("_s"))
    )
    return (
        two_m.crossJoin(w_in)
        .crossJoin(sq)
        .select(
            F.when(
                F.col("_tm").isNull() | (F.col("_tm") == 0), F.lit(0.0)
            )
            .otherwise(
                F.col("_wi") / F.col("_tm")
                - F.col("_s") / (F.col("_tm") * F.col("_tm"))
            )
            .alias("modularity")
        )
    )


def modularity(edges: DataFrame, labels: DataFrame) -> float:
    """labels: (conv_id, label). Returns Newman modularity Q ∈ [-0.5, 1]."""
    return float(modularity_df(edges, labels).collect()[0]["modularity"])
