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


def modularity(edges: DataFrame, labels: DataFrame) -> float:
    """labels: (conv_id, label). Returns Newman modularity Q ∈ [-0.5, 1]."""
    und = _undirected_weighted(edges)  # (u, v, w) both directions
    # 2m = total undirected weight (each edge counted twice in `und`)
    two_m = und.agg(F.sum("w")).collect()[0][0]
    if not two_m:
        return 0.0
    lab_u = labels.select(
        F.col("conv_id").alias("u"), F.col("label").alias("lu")
    )
    lab_v = labels.select(
        F.col("conv_id").alias("v"), F.col("label").alias("lv")
    )
    tagged = und.join(lab_u, "u").join(lab_v, "v")
    # in-community weight (both directions counted → already 2·w_in)
    w_in = (
        tagged.filter(F.col("lu") == F.col("lv"))
        .agg(F.sum("w"))
        .collect()[0][0]
        or 0.0
    )
    # per-community degree sums: deg(v) = Σ incident weight
    deg = und.groupBy("u").agg(F.sum("w").alias("deg"))
    comm_deg = (
        deg.join(lab_u, "u")
        .groupBy("lu")
        .agg(F.sum("deg").alias("d"))
    )
    sq = comm_deg.agg(
        F.sum(F.col("d") * F.col("d")).alias("s")
    ).collect()[0]["s"]
    return float(w_in / two_m - sq / (two_m * two_m))
