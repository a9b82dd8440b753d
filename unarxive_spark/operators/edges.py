"""L2 edge build: transcripts → directed weighted edge table.

Reference analog: the citation-graph construction —
span extraction (/root/reference/src/parse_latex_tralics.py:106-123),
reference resolution (/root/reference/src/match_references_openalex.py),
marker-count edge weights
(/root/reference/src/utility_scripts/calc_stats.py:213-223:
``num_mrkrs = para['text'].count(ref_id)``).

Pipeline (all JVM-side built-ins — zero Python in the hot path):
  transcripts
    → mine ref ids from text+tool (``regexp_extract_all``; codegen)
    → explode
    → drop self-loops
    → resolve dst against existing conv_ids (left-semi join; the
      broadcast hint applies when the vertex set is small, AQE converts
      to broadcast at runtime otherwise)
    → groupBy(src, dst).count() as weight   [one shuffle, map-side combine]

Scale notes: at 10^12 turns the explode output is the dominant
intermediate; the groupBy partial-aggregates before shuffle so the wire
volume is ~|distinct(src,dst)|. The result is written hash-distributed by
``src_conv_id`` so downstream supersteps reuse the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.refs import extract_ref_ids

EDGE_SCHEMA = "src_conv_id string, dst_conv_id string, weight double"


def mine_refs(transcripts: DataFrame) -> DataFrame:
    """(conv_id, ref_id) pairs — one row per marker occurrence.

    Both ``text`` and ``tool`` are mined (input_hint: "mine
    cross-conversation references in text/tool fields").
    """
    refs = F.concat(
        extract_ref_ids("text"),
        extract_ref_ids("tool"),
    )
    return transcripts.select(
        F.col("conv_id").alias("src_conv_id"),
        F.explode(refs).alias("ref_id"),
    )


def build_edges(
    transcripts: DataFrame,
    resolve: bool = True,
    drop_self_loops: bool = True,
    broadcast_vertices: bool = False,
) -> DataFrame:
    """transcripts → edges(src_conv_id, dst_conv_id, weight).

    ``resolve=True`` keeps only edges whose destination exists as a
    conversation in the input (analog of the reference's
    OpenAlex-resolved subset, ~44% of raw references,
    /root/reference/README.md:28). Weight = number of marker occurrences
    (duplicates within a turn accumulate, matching calc_stats.py:213-223).

    ``broadcast_vertices``: leave False at scale — the vertex set is one
    row per conversation (10^9-10^10 at the target scale; a forced
    broadcast would OOM the driver). The planner/AQE broadcasts the semi
    join automatically whenever the distinct-id side is actually small,
    so the hint only matters when statistics mislead.
    """
    pairs = mine_refs(transcripts)
    if drop_self_loops:
        pairs = pairs.filter(F.col("src_conv_id") != F.col("ref_id"))
    if resolve:
        vertices = transcripts.select(
            F.col("conv_id").alias("ref_id")
        ).distinct()
        if broadcast_vertices:
            vertices = F.broadcast(vertices)
        pairs = pairs.join(vertices, "ref_id", "left_semi")
    return (
        pairs.groupBy("src_conv_id", F.col("ref_id").alias("dst_conv_id"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def edge_resolution_metrics(transcripts: DataFrame) -> DataFrame:
    """Raw vs resolved reference counts + link rate.

    Analog of the reference's success-quota metrics
    (/root/reference/src/match_references_openalex.py:616-632) and
    ``refmatch_rate`` (/root/reference/src/utility_scripts/calc_stats.py:25-39).
    """
    pairs = mine_refs(transcripts).filter(
        F.col("src_conv_id") != F.col("ref_id")
    )
    vertices = transcripts.select(F.col("conv_id").alias("ref_id")).distinct()
    # no broadcast hint: the vertex dim is per-conversation (huge at
    # target scale); planner broadcasts automatically when small
    tagged = pairs.join(
        vertices.withColumn("resolved", F.lit(1)), "ref_id", "left"
    )
    return tagged.agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.sum(F.coalesce(F.col("resolved"), F.lit(0))).alias("n_refs_linked"),
        (
            F.sum(F.coalesce(F.col("resolved"), F.lit(0)))
            / F.count(F.lit(1))
        ).alias("link_rate"),
    )


def enrich_edges(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Attach destination-side attributes to each edge — the
    ``extend_matched`` analog (/root/reference/src/extend_matched.py:
    101-131: attach cited work's discipline + arXiv ID to each resolved
    reference). Left join on dst; missing attrs stay null (reference
    keeps unmatched entries with empty ids)."""
    dst_attrs = vertices.select(
        F.col("conv_id").alias("dst_conv_id"),
        F.col("category").alias("dst_category"),
        F.col("group").alias("dst_group"),
    )
    # per-conversation attrs — big at scale; planner picks the strategy
    return edges.join(dst_attrs, "dst_conv_id", "left").select(
        "src_conv_id", "dst_conv_id", "weight", "dst_category", "dst_group"
    )


def repartition_by_src(edges: DataFrame, n: int | None = None) -> DataFrame:
    """Hash-distribute the edge table by source for superstep reuse.

    Spark can't persist co-partitioning across actions automatically
    (SURVEY.md §4.3); callers cache/checkpoint the result once and every
    subsequent ``edges ⋈ ranks`` on src avoids re-shuffling the big side.
    """
    return (
        edges.repartition(n, "src_conv_id")
        if n
        else edges.repartition("src_conv_id")
    )
