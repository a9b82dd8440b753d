"""Co-citation and bibliographic coupling — the two classic
citation-network similarity measures, over the conversation link graph.

- **Co-citation** (Small 1973): conversations A and B are similar when
  the same third conversation cites both → pairs grouped by shared
  citER count.
- **Bibliographic coupling** (Kessler 1963): A and B are similar when
  they cite the same conversations → pairs grouped by shared citED
  count.

These are the standard second-order measures computed over exactly the
edge table unarXive's citation network exists to enable (its JCDL'23
framing, /root/reference/README.md:27-32).

Shape: self-equi-join on the shared endpoint + count — the same
wedge-join pattern as the triangle counter; at scale the join key is the
shared endpoint, so hub conversations fan out quadratically → cap with
``max_degree`` (standard practice: drop mega-hubs from second-order
similarity, they carry no signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _filtered(edges: DataFrame, key: str, max_degree: int | None) -> DataFrame:
    e = edges.select("src_conv_id", "dst_conv_id").distinct()
    if max_degree is None:
        return e
    deg = e.groupBy(key).agg(F.count(F.lit(1)).alias("_d"))
    return (
        e.join(deg.filter(F.col("_d") <= max_degree), key, "left_semi")
    )


def co_citation(
    edges: DataFrame, min_count: int = 1, max_degree: int | None = None
) -> DataFrame:
    """(a, b, n_common_citers) for a < b; hubs capped by out-degree of
    the shared citer when ``max_degree`` is set."""
    e = _filtered(edges, "src_conv_id", max_degree)
    pairs = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.src_conv_id") == F.col("r.src_conv_id"))
            & (F.col("l.dst_conv_id") < F.col("r.dst_conv_id")),
        )
        .groupBy(
            F.col("l.dst_conv_id").alias("a"),
            F.col("r.dst_conv_id").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common_citers"))
    )
    return pairs.filter(F.col("n_common_citers") >= min_count)


def bibliographic_coupling(
    edges: DataFrame, min_count: int = 1, max_degree: int | None = None
) -> DataFrame:
    """(a, b, n_common_cited) for a < b; hubs capped by in-degree of the
    shared cited conversation when ``max_degree`` is set."""
    e = _filtered(edges, "dst_conv_id", max_degree)
    pairs = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.dst_conv_id") == F.col("r.dst_conv_id"))
            & (F.col("l.src_conv_id") < F.col("r.src_conv_id")),
        )
        .groupBy(
            F.col("l.src_conv_id").alias("a"),
            F.col("r.src_conv_id").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common_cited"))
    )
    return pairs.filter(F.col("n_common_cited") >= min_count)
