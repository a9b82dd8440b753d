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

from unarxive_spark.functions.license import (
    PERMISSIVE,
    derive_license_url,
    license_coarse,
)
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
        F.when(F.col("role") == "user", 1).otherwise(0).alias("is_user"),
        F.when(F.col("role") == "assistant", 1)
        .otherwise(0)
        .alias("is_assistant"),
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
        F.sum("is_user").alias("n_user_turns"),
        F.sum("is_assistant").alias("n_assistant_turns"),
        F.sum("n_chars_turn").alias("n_chars"),
        F.date_format(F.min("ts"), "yyyy-MM").alias("month"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
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
            "n_user_turns",
            "n_assistant_turns",
            "n_chars",
            cat.alias("category"),
            group_of_category(cat).alias("group"),
            "month",
            "day",
            license_coarse(derive_license_url("conv_id")).alias(
                "license_coarse"
            ),
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


def category_month_cube_full(vertices: DataFrame) -> DataFrame:
    """The FULL (category × month) metrics cube — 23 metrics per cell,
    matching the reference's accumulation breadth (calc_stats.py:487-599:
    ~23 per-paper metrics incl. license buckets and success-vs-NO_*
    rates). One shuffle; every metric is a conditional sum/max inside the
    same partial-aggregated groupBy (Catalyst fuses them — adding metrics
    widens rows, not stages)."""
    zero_guard = lambda num, den: F.when(  # noqa: E731
        den == 0, F.lit(0.0)
    ).otherwise(num / den)
    refs = F.col("n_refs")
    linked = F.col("n_refs_linked")
    return (
        vertices.groupBy("category", "month")
        .agg(
            # volume
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_turns").alias("n_turns"),
            F.sum("n_user_turns").alias("n_user_turns"),
            F.sum("n_assistant_turns").alias("n_assistant_turns"),
            F.sum("n_tool_turns").alias("n_tool_turns"),
            F.sum("n_chars").alias("n_chars"),
            # reference mining / linking
            F.sum("n_refs").alias("n_refs"),
            F.sum("n_refs_linked").alias("n_refs_linked"),
            F.sum(refs - linked).alias("n_refs_unlinked"),
            # success-vs-NO_* conversation buckets (calc_stats NO_CIT /
            # success-rate analogs)
            F.sum(F.when(refs > 0, 1).otherwise(0)).alias(
                "n_convs_with_refs"
            ),
            F.sum(F.when(refs == 0, 1).otherwise(0)).alias(
                "n_convs_no_refs"
            ),
            F.sum(
                F.when((refs > 0) & (linked == refs), 1).otherwise(0)
            ).alias("n_convs_fully_linked"),
            F.sum(
                F.when((refs > 0) & (linked == 0), 1).otherwise(0)
            ).alias("n_convs_none_linked"),
            # extrema
            F.max("n_turns").alias("max_turns"),
            F.max("n_refs").alias("max_refs"),
            # license buckets (calc_stats license matrices analog)
            F.sum(
                F.when(F.col("license_coarse").isin(*PERMISSIVE), 1)
                .otherwise(0)
            ).alias("n_lic_permissive"),
            F.sum(
                F.when(
                    F.col("license_coarse").startswith("cc-by-nc"), 1
                ).otherwise(0)
            ).alias("n_lic_nc"),
            F.sum(
                F.when(F.col("license_coarse") == "none", 1).otherwise(0)
            ).alias("n_lic_none"),
            F.sum(
                F.when(
                    F.col("license_coarse") == "arxiv-nonexclusive", 1
                ).otherwise(0)
            ).alias("n_lic_arxiv"),
            # ratios (ratio-of-sums, zero-guarded, rounded for the
            # cross-engine hash)
            F.round(F.avg("n_turns"), 6).alias("avg_turns_per_conv"),
            F.round(
                zero_guard(F.sum("n_chars"), F.sum("n_turns")), 6
            ).alias("avg_chars_per_turn"),
            F.round(
                zero_guard(F.sum("n_refs_linked"), F.sum("n_refs")), 6
            ).alias("link_rate"),
            F.round(
                zero_guard(F.sum("n_tool_turns"), F.sum("n_turns")), 6
            ).alias("tool_rate"),
        )
    )


def link_rate_by_day(vertices: DataFrame) -> DataFrame:
    """Per-group-over-time ratio series — the
    ``get_cats_over_years_plot_data`` analog (calc_stats.py:361-403:
    part/total per (discipline, year); the synthetic corpus spans one
    month, so the time axis is days)."""
    return (
        vertices.groupBy("group", "day")
        .agg(
            F.sum("n_refs").alias("n_refs"),
            F.sum("n_refs_linked").alias("n_refs_linked"),
        )
        .select(
            "group",
            "day",
            "n_refs",
            "n_refs_linked",
            F.round(
                F.when(F.col("n_refs") == 0, F.lit(0.0)).otherwise(
                    F.col("n_refs_linked") / F.col("n_refs")
                ),
                6,
            ).alias("link_rate"),
        )
    )


# 3-level taxonomy: category → archive → tax_group, mirroring the
# reference's category→archive→group walk (arxiv_taxonomy.py:10-51 +
# extend_matched.py:19-36). Containment by integer division: 12
# categories → 6 archives → 3 groups.
N_ARCHIVES = 6
N_TAX_GROUPS = 3


def taxonomy_rows() -> list[tuple[str, str, str]]:
    return [
        (f"cat{c:02d}", f"arch{c // 2}", f"tgrp{c // 4}")
        for c in range(N_CATEGORIES)
    ]


def taxonomy_dim(spark) -> DataFrame:
    """The taxonomy as a literal dimension table — the reference's
    in-memory taxonomy dict becomes a broadcastable dim the walk JOINs
    against (Spark-first: no driver-side dict lookups per row)."""
    return spark.createDataFrame(
        taxonomy_rows(), "category string, archive string, tax_group string"
    )


def taxonomy_rollup(vertices: DataFrame) -> DataFrame:
    """3-level taxonomy walk + rollup (J6 full shape): vertex →
    category → archive → tax_group via broadcast dim join, then ROLLUP
    grouping sets over all three levels."""
    dim = F.broadcast(taxonomy_dim(vertices.sparkSession))
    return (
        vertices.join(dim, "category")
        .rollup("tax_group", "archive", "category")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_refs").alias("n_refs"),
        )
        .select(
            F.coalesce("tax_group", F.lit("ALL")).alias("tax_group"),
            F.coalesce("archive", F.lit("ALL")).alias("archive"),
            F.coalesce("category", F.lit("ALL")).alias("category"),
            "n_convs",
            "n_refs",
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
