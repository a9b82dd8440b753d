"""Deterministic, fully-distributed synthetic transcripts generator.

Shape per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``.

Design goals (FIXTURES.md §1):
- **Distributed by construction**: built from ``spark.range`` + hash
  arithmetic — no driver-side loop, no ``collect``; generating 10^12 turns
  is the same plan at a bigger range.
- **Deterministic**: every random choice is ``h64(seed || key)`` — same
  seed → byte-identical table at any parallelism/partitioning.
- **Skewed**: a configurable share of references point at a small hub set
  (Zipf-ish in-degree — the graft analog of a paper with 1,627
  ref_entries in the reference's sample data).
- **Unresolved refs**: a fraction point at nonexistent conv_ids (analog
  of unarXive's ~56% unlinked references, /root/reference/README.md:28).
- **Unicode fixture**: multi-byte text (CJK + emoji) embedded so the
  byte-identity invariant is tested against Arrow round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64

EPOCH = "2025-01-01 00:00:00"


def conv_id_expr(n):
    """int column → canonical conv_id string ``c%06d``."""
    return F.format_string("c%06d", n)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    max_turns: int = 30,
    hub_count: int = 5,
    hub_share_pct: int = 30,
    unresolved_pct: int = 25,
    partitions: int | None = None,
) -> DataFrame:
    """Generate the transcripts table.

    Turns per conversation ~ U[3, max_turns]; each turn embeds 0..3
    ``conv:<id>`` markers in ``text`` (and, for tool turns, one more in
    ``tool``). ``hub_share_pct``% of resolvable refs target one of
    ``hub_count`` hub conversations; ``unresolved_pct``% of all refs
    target ids outside [0, n_convs) and never resolve.
    """
    s = str(seed)

    convs = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_n"),
        (
            F.lit(3)
            + h64(F.concat(F.lit(s), F.lit("|nturns|"), F.col("id").cast("string")))
            % F.lit(max_turns - 2)
        )
        .cast("int")
        .alias("n_turns"),
    )

    turns = convs.select(
        "conv_n",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    key = F.concat_ws("|", F.lit(s), F.col("conv_n"), F.col("turn_idx"))

    def hx(tag: str):
        return h64(F.concat(key, F.lit("|" + tag)))

    # role: deterministic cycle seasoned with hash — user/assistant/tool
    role = (
        F.when(hx("role") % 5 == 0, F.lit("tool"))
        .when(hx("role") % 2 == 0, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )

    # reference targets: up to 3 per turn
    def target(tag: str):
        """One candidate dst conv number; may be out of range (unresolved)."""
        h = hx(tag)
        unresolved = (h % 100) < unresolved_pct
        hub = ((h % 1000) / 10).cast("int") < hub_share_pct  # independent digit
        dst_hub = h % hub_count
        dst_uniform = h % n_convs
        dst_bad = n_convs + (h % n_convs)
        return (
            F.when(unresolved, dst_bad)
            .when(hub, dst_hub)
            .otherwise(dst_uniform)
        )

    n_refs = (hx("nrefs") % 4).cast("int")  # 0..3 refs in text

    # Filler vocabulary with multi-byte unicode to exercise Arrow round-trip.
    filler = F.elt(
        (hx("fill") % 6 + 1).cast("int"),
        F.lit("let me check that run"),
        F.lit("the previous agent said"),
        F.lit("合計の結果を確認 📊"),
        F.lit("vérifié — résultats ci-dessous"),
        F.lit("tool output follows"),
        F.lit("см. предыдущий разговор"),
    )

    def marker(tag: str):
        return F.concat(F.lit("conv:"), conv_id_expr(target(tag)))

    text = F.concat_ws(
        " ",
        filler,
        F.when(n_refs >= 1, marker("t1")).otherwise(F.lit("")),
        F.when(n_refs >= 2, marker("t2")).otherwise(F.lit("")),
        F.when(n_refs >= 3, marker("t3")).otherwise(F.lit("")),
        # duplicate-ref fixture: sometimes repeat t1 (weight accumulation)
        F.when((n_refs >= 1) & (hx("dup") % 4 == 0), marker("t1")).otherwise(
            F.lit("")
        ),
    )

    tool = F.when(
        role == "tool",
        F.concat(F.lit("lookup("), marker("tool"), F.lit(")")),
    ).otherwise(F.lit(""))

    ts = F.to_timestamp(F.lit(EPOCH)) + F.make_interval(
        secs=(F.col("conv_n") * 86400 + F.col("turn_idx") * 60).cast("double")
    )

    return turns.select(
        conv_id_expr(F.col("conv_n")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def golden_graphs(spark: SparkSession) -> dict[str, DataFrame]:
    """Tiny named edge tables with known properties (FIXTURES.md §2):
    chain, star hub, two components, triangle clique, self-loop."""

    def edges(rows):
        return spark.createDataFrame(
            [(f"c{a:06d}", f"c{b:06d}", float(w)) for a, b, w in rows],
            "src_conv_id string, dst_conv_id string, weight double",
        )

    return {
        "chain": edges([(0, 1, 1), (1, 2, 1), (2, 3, 1)]),
        "star": edges([(i, 0, 1) for i in range(1, 6)]),
        "two_components": edges([(0, 1, 1), (1, 0, 1), (2, 3, 1), (3, 4, 1)]),
        "triangle": edges([(0, 1, 1), (1, 2, 1), (2, 0, 1)]),
        "self_loop": edges([(0, 0, 1), (0, 1, 1)]),
    }
