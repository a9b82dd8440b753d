"""Grouped-map (applyInPandas) CSR-style local gather — the alternate
superstep kernel the north star names ("applyInPandas per adjacency
partition"); SURVEY.md §2.10 note 4.

When to use which gather:
- **Built-in join+agg** (operators/pagerank.py): the default — JVM
  codegen, partial aggregation, AQE. Wins whenever the gather is an
  algebraic aggregate (sum/min/max/count).
- **applyInPandas grouped-map** (this module): for gathers that are NOT
  algebraic (e.g. per-destination quantiles of incoming contributions,
  weighted medians, top-k with payloads) where map-side combine can't
  apply. One Arrow batch per dst-hash group; numpy does the inner loop.

The demo kernel computes, per destination, both the SUM (cross-checked
against the join+agg path in tests) and the MAX and count of incoming
contributions — the latter two stand in for non-algebraic statistics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GATHER_SCHEMA = (
    "dst_conv_id string, contrib_sum double, contrib_max double, "
    "n_in long"
)


def gather_contributions_grouped(
    edges: DataFrame,
    ranks: DataFrame,
    n_groups: int = 64,
) -> DataFrame:
    """edges(src,dst,weight) ⋈ ranks(conv_id,rank) → per-dst statistics
    via applyInPandas over hash-bucketed dst groups.

    Bucketing by ``pmod(xxhash64(dst), n_groups)`` instead of grouping by
    raw dst bounds the number of Python invocations to n_groups (one
    Arrow exchange each) regardless of vertex count — the CSR-partition
    pattern: each group holds a contiguous slice of the adjacency, and
    the pandas kernel aggregates locally with numpy.
    """
    contribs = (
        edges.join(
            ranks.withColumnRenamed("conv_id", "src_conv_id"),
            "src_conv_id",
        )
        .select(
            "dst_conv_id",
            (F.col("weight") * F.col("rank")).alias("c"),
            F.pmod(F.xxhash64("dst_conv_id"), F.lit(n_groups)).alias("_g"),
        )
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # the WHOLE bucket arrives in one frame — per-dst statistics may
        # be arbitrary (non-algebraic) functions of the full in-list
        g = pdf.groupby("dst_conv_id")["c"]
        out = g.agg(["sum", "max", "count"]).reset_index()
        out.columns = ["dst_conv_id", "contrib_sum", "contrib_max", "n_in"]
        out["n_in"] = out["n_in"].astype("int64")
        return out

    # grouped-map: one shuffle on the bucket key, each kernel invocation
    # sees its complete bucket (every row of every dst hashed into it) —
    # the guarantee non-algebraic statistics need.
    return contribs.groupBy("_g").applyInPandas(
        kernel, schema=GATHER_SCHEMA
    )
