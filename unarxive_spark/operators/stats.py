"""L4 reporting — the calc_stats analog (SURVEY.md §2.4 A1-A10).

The reference accumulates 23 metrics into dense (category × month) numpy
matrices with contiguous group/year ranges for cheap rollups
(/root/reference/src/utility_scripts/calc_stats.py:274-599). Here the
same cube is a ``groupBy``/``rollup`` — Catalyst's partial aggregation
replaces the hand-built matrix, and grouping-set rollups replace the
contiguous-slice sums (calc_stats.py:332-358).

Everything in this module is pure built-ins (JVM codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.refs import extract_ref_ids

# Synthetic 2-level taxonomy: conv → category → group, derived
# deterministically from the conv_id (analog of the arXiv taxonomy walk,
# /root/reference/src/utility_scripts/arxiv_taxonomy.py +
# extend_matched.py:19-36). 12 categories folding into 4 groups.
N_CATEGORIES = 12
N_GROUPS = 4


def category_expr(conv_id):
    """Deterministic category leaf for a conversation (portable to SQL)."""
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    n = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return F.format_string("cat%02d", (n % N_CATEGORIES).cast("int"))


def group_of_category(category):
    c = F.col(category) if isinstance(category, str) else category
    return F.format_string(
        "grp%d",
        (F.substring(c, 4, 2).cast("int") % N_GROUPS),
    )


def build_vertices(transcripts: DataFrame) -> DataFrame:
    """Per-conversation attribute table (FIXTURES.md §3): n_turns, n_refs,
    n_refs_linked, category, group, month.

    Analog of per-document stats A1 (calc_stats.py:121-271): counts of
    paragraphs, refs, linked refs.
    """
    refs = F.concat(extract_ref_ids("text"), extract_ref_ids("tool"))
    per_turn = transcripts.select(
        "conv_id",
        "ts",
        F.size(refs).alias("n_refs_turn"),
        F.filter(refs, lambda r: r != F.col("conv_id")).alias("ref_ids"),
        F.when(F.col("role") == "tool", 1).otherwise(0).alias("is_tool"),
        F.length("text").alias("n_chars_turn"),
    )
    vertex_ids = transcripts.select(F.col("conv_id").alias("ref_id")).distinct()
    exploded = per_turn.select(
        "conv_id", F.explode_outer("ref_ids").alias("ref_id")
    )
    # no broadcast hint: vertex_ids is per-conversation (huge at target
    # scale); planner auto-broadcasts when actually small
    linked = (
        exploded.join(
            vertex_ids.withColumn("ok", F.lit(1)),
            "ref_id",
            "left",
        )
        .groupBy("conv_id")
        .agg(
            F.sum(
                F.when(F.col("ref_id").isNotNull(), 1).otherwise(0)
            ).alias("n_refs_nonself"),
            F.sum(F.coalesce(F.col("ok"), F.lit(0))).alias("n_refs_linked"),
        )
    )
    base = per_turn.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("n_refs_turn").alias("n_refs"),
        F.sum("is_tool").alias("n_tool_turns"),
        F.sum("n_chars_turn").alias("n_chars"),
        F.date_format(F.min("ts"), "yyyy-MM").alias("month"),
    )
    cat = category_expr("conv_id")
    return (
        base.join(linked.drop("n_refs_nonself"), "conv_id", "left")
        .select(
            "conv_id",
            "n_turns",
            "n_refs",
            F.coalesce("n_refs_linked", F.lit(0)).alias("n_refs_linked"),
            "n_tool_turns",
            "n_chars",
            cat.alias("category"),
            group_of_category(cat).alias("group"),
            "month",
        )
    )


def category_month_cube(vertices: DataFrame) -> DataFrame:
    """The (category × month) metrics cube (A2, calc_stats.py:487-599)."""
    return (
        vertices.groupBy("category", "month")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_turns").alias("n_turns"),
            F.sum("n_refs").alias("n_refs"),
            F.sum("n_refs_linked").alias("n_refs_linked"),
            F.sum("n_tool_turns").alias("n_tool_turns"),
            F.sum("n_chars").alias("n_chars"),
        )
    )


def group_rollup(vertices: DataFrame) -> DataFrame:
    """Group/category rollup (A3, calc_stats.py:332-345) via ROLLUP
    grouping sets — the contiguous-slice sums of the reference's matrix."""
    return (
        vertices.rollup("group", "category")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_refs").alias("n_refs"),
        )
        .select(
            F.coalesce("group", F.lit("ALL")).alias("group"),
            F.coalesce("category", F.lit("ALL")).alias("category"),
            "n_convs",
            "n_refs",
        )
    )


def year_rollup(vertices: DataFrame) -> DataFrame:
    """Year/month rollup (A4, calc_stats.py:347-358)."""
    return (
        vertices.withColumn("year", F.substring("month", 1, 4))
        .rollup("year", "month")
        .agg(F.count(F.lit(1)).alias("n_convs"), F.sum("n_turns").alias("n_turns"))
        .select(
            F.coalesce("year", F.lit("ALL")).alias("year"),
            F.coalesce("month", F.lit("ALL")).alias("month"),
            "n_convs",
            "n_turns",
        )
    )


def link_rate_by_group(vertices: DataFrame) -> DataFrame:
    """Ratio-of-sums per group (A5 + refmatch_rate,
    calc_stats.py:25-39,361-403): Σ linked / Σ refs, zero-guarded."""
    return (
        vertices.groupBy("group")
        .agg(
            F.sum("n_refs").alias("n_refs"),
            F.sum("n_refs_linked").alias("n_refs_linked"),
        )
        .select(
            "group",
            "n_refs",
            "n_refs_linked",
            F.when(F.col("n_refs") == 0, F.lit(0.0))
            .otherwise(F.col("n_refs_linked") / F.col("n_refs"))
            .alias("link_rate"),
        )
    )


def role_histogram(transcripts: DataFrame) -> DataFrame:
    """Histogram of turns per role (A6 license-histogram analog,
    /root/reference/src/utility_scripts/count_licenses.py:7-30)."""
    return transcripts.groupBy("role").agg(F.count(F.lit(1)).alias("n_turns"))
