"""Fuzzy mention resolution — the J4 "title match cascade" analog
(/root/reference/src/match_references_openalex.py:230-314), the
reference's flagship join:

    equi-join on normalized key
      → exactly 1 match: verify containment predicate
      → >1 matches:      filter by containment, then argmax rank metric
      → 0 matches:       retry with key minus first token,
                         then minus last token (one recursion level)

Spark-first re-expression: instead of a per-row lookup loop, the whole
cascade is ONE declarative plan — a 3-way union of equi-joins (full /
drop-first / drop-last keys, tagged with match_rank 1/2/3) + the
containment semi-predicate + a single window
``row_number() over (partition by mention order by match_rank,
rank_metric desc, id)`` — so Catalyst broadcasts the dimension once and
the cascade costs one shuffle, not three sequential lookups. First-hit
semantics of the reference's early return are reproduced by ordering on
match_rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_key(col: Column | str) -> Column:
    """Reference's title normalization (P16,
    match_references_openalex.py:214-227): strip non-word chars,
    collapse whitespace, lowercase. (Transliteration handled separately
    by functions.texttools.transliterate when needed.)"""
    c = F.col(col) if isinstance(col, str) else col
    # \p{L}\p{N}: unicode-aware (Java regex \w is ASCII-only and would
    # blank out accented letters)
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}\s]", " "),
            r"\s+",
            " ",
        )
    )


def _drop_first(col: Column) -> Column:
    toks = F.split(col, " ")
    return F.concat_ws(
        " ", F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    )


def _drop_last(col: Column) -> Column:
    toks = F.split(col, " ")
    return F.concat_ws(
        " ", F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    )


def match_cascade(
    mentions: DataFrame,
    dim: DataFrame,
    mention_id: str = "mention_id",
    mention_col: str = "mention",
    dim_id: str = "doc_id",
    dim_key: str = "dim_key",
    rank_metric: str = "rank_metric",
    containment_token: str | None = "first_token",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Resolve each mention to at most one dim row.

    mentions: (mention_id, mention, ...); dim: (doc_id, dim_key,
    rank_metric[, first_token]). Returns (mention_id, doc_id, match_rank).

    ``containment_token``: if set, a candidate only survives when that
    dim token appears in the *full original* mention (the author-last-
    name-in-ref-string predicate, match_references_openalex.py:230-239).
    """
    norm = normalize_key(mention_col)
    keyed = mentions.select(
        F.col(mention_id),
        norm.alias("_k1"),
        normalize_key(_drop_first(norm)).alias("_k2"),
        normalize_key(_drop_last(norm)).alias("_k3"),
        F.split(norm, " ").alias("_mention_toks"),
    )
    d = dim.select(
        F.col(dim_id),
        normalize_key(dim_key).alias("_dk"),
        F.col(rank_metric).alias("_metric"),
        *([F.col(containment_token).alias("_ct")] if containment_token else []),
    )
    if broadcast_dim:
        d = F.broadcast(d)

    def attempt(key_col: str, rank: int) -> DataFrame:
        cand = keyed.join(d, F.col(key_col) == F.col("_dk")).select(
            mention_id,
            dim_id,
            "_metric",
            "_mention_toks",
            *(["_ct"] if containment_token else []),
            F.lit(rank).alias("match_rank"),
        )
        return cand

    cands = (
        attempt("_k1", 1)
        .unionByName(attempt("_k2", 2))
        .unionByName(attempt("_k3", 3))
    )
    if containment_token:
        cands = cands.filter(
            F.array_contains(F.col("_mention_toks"), F.col("_ct"))
        )
    w = Window.partitionBy(mention_id).orderBy(
        F.asc("match_rank"), F.desc("_metric"), F.asc(dim_id)
    )
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(mention_id, dim_id, "match_rank")
    )
