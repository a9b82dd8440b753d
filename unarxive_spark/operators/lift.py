"""Entry lifting: move bulky payloads out of turns into a typed side
table, leaving deterministic inline markers.

Reference analog (P9): figures/tables/formulas are lifted out of the
document body into ``ref_entries`` keyed by id, with an inline
``{{figure:<uuid>}}`` marker left in the text
(/root/reference/src/parse_latex_tralics.py:322-415). The reference uses
``uuid4``; we use the content hash ``sha1(payload ‖ conv_id)`` so runs
are reproducible and checkpoint-resumable (SURVEY.md §4.4; same
discipline as the bib-key hash, parse_latex_tralics.py:460-470).

Graft shape: tool turns carry ``lookup(...)`` payloads in ``tool``;
lifting yields
- turns with ``tool`` replaced by ``{{tool:<sha1>}}``
- ``entries(entry_id, conv_id, turn_idx, type, payload)``

Invariant (tested): re-inlining an entry's payload at its marker
reproduces the original ``tool`` string byte-identically — the analog of
the reference's span/offset fidelity.

All built-ins: sha1/concat/regexp — zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARKER_FMT = "{{tool:%s}}"


def lift_tool_entries(
    transcripts: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """→ (turns_lifted, entries).

    Only non-empty ``tool`` payloads are lifted; other turns pass
    through unchanged (``entry_id`` null).
    """
    has_payload = (F.col("tool").isNotNull()) & (F.col("tool") != "")
    entry_id = F.sha1(F.concat(F.col("tool"), F.col("conv_id")))
    lifted = transcripts.withColumn(
        "entry_id", F.when(has_payload, entry_id)
    )
    turns_lifted = lifted.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.when(
            F.col("entry_id").isNotNull(),
            F.format_string(MARKER_FMT, F.col("entry_id")),
        )
        .otherwise(F.col("tool"))
        .alias("tool"),
        "ts",
        "entry_id",
    )
    entries = (
        lifted.filter(F.col("entry_id").isNotNull())
        .select(
            "entry_id",
            "conv_id",
            "turn_idx",
            F.lit("tool_call").alias("type"),
            F.col("tool").alias("payload"),
        )
        # identical payload within a conversation collapses to one entry
        # (reference: identical bib text hashes to the same key,
        # parse_latex_tralics.py:470-474) — keep the earliest turn
        .groupBy("entry_id", "conv_id", "type", "payload")
        .agg(F.min("turn_idx").alias("first_turn_idx"))
        .select("entry_id", "conv_id", "first_turn_idx", "type", "payload")
    )
    return turns_lifted, entries


def reinline(turns_lifted: DataFrame, entries: DataFrame) -> DataFrame:
    """Inverse of :func:`lift_tool_entries` — splice payloads back in
    place of their markers (used by the round-trip invariant test).
    Join on the entry key, then a single string replace."""
    e = entries.select("entry_id", "payload")
    # entries scale with the corpus — no broadcast hint
    joined = turns_lifted.join(e, "entry_id", "left")
    restored = F.when(
        F.col("entry_id").isNotNull(), F.col("payload")
    ).otherwise(F.col("tool"))
    return joined.select(
        "conv_id", "turn_idx", "role", "text",
        restored.alias("tool"), "ts",
    )
