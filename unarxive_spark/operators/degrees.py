"""Degree statistics over the edge table (simplest calc_stats question:
"most-cited conversation" — SURVEY.md §7 step 2).

All pure built-ins: one shuffle per degree direction, top-k via
``orderBy().limit()`` (Spark plans TakeOrderedAndProject — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst_conv_id").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("weight").alias("in_weight"),
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src_conv_id").alias("conv_id")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("weight").alias("out_weight"),
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Full outer merge of in/out degrees, zero-filled."""
    return (
        in_degrees(edges)
        .join(out_degrees(edges), "conv_id", "full_outer")
        .select(
            "conv_id",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("in_weight", F.lit(0.0)).alias("in_weight"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("out_weight", F.lit(0.0)).alias("out_weight"),
        )
    )


def top_cited(edges: DataFrame, k: int = 10) -> DataFrame:
    """Top-k conversations by total in-weight (most-cited; deterministic
    tie-break on conv_id)."""
    return (
        in_degrees(edges)
        .orderBy(F.desc("in_weight"), F.asc("conv_id"))
        .limit(k)
    )
