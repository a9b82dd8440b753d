"""Generalized suffix array over the token corpus, by distributed
prefix doubling, plus adjacent-suffix LCPs — the exact-substring
machinery behind suffix-array dedup (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better"): the maximum LCP between
any two suffixes IS the longest repeated token sequence in the corpus,
and the per-length pair histogram is the repeated-span spectrum that
q97's fixed-window screen can only sample at one window size.

Suffixes are identified as ``(doc_id, off)`` — a *generalized* suffix
array over the document set, so no cross-document sentinel tokens are
needed (a suffix simply ends at its document's end; rank blocks that
run past the end compare via a -1 pad, which can never equal a real
rank).  Everything is exact integer arithmetic — ranks, offsets,
lengths — so a DuckDB oracle replays the construction bit-for-bit.

Scale shape (100 TB): prefix doubling is the textbook distributed
construction — O(log maxlen) supersteps, each one distinct + one
exact global dense-rank + two hash equi-joins, all on the
(doc_id, off) key space.  The global sort-rank itself is de-skewed:
range-repartition, rank within partition, add broadcast partition
offsets (``_global_dense_ranks``) — no single-task whole-corpus
window anywhere.  LCPs then come from binary lifting over the saved
per-round rank tables: O(log maxlen) bounded left joins, no
token-by-token comparison loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.texttools import tokens

__all__ = [
    "suffix_ranks",
    "repeated_span_histogram",
    "duplicated_span_stats",
]


def _global_dense_ranks(
    df: DataFrame,
    cols: list[str],
    out_col: str,
    n_parts: int = 32,
) -> DataFrame:
    """Attach the exact 1-based dense rank of the ``cols`` tuple in
    ascending lexicographic order over the whole frame.

    Distributed: DISTINCT tuples are range-repartitioned (equal tuples
    land together by construction), ranked within each partition, and
    shifted by broadcast per-partition row-count offsets — partition
    boundaries come from sampling but the resulting rank is a pure
    function of the data."""
    d = df.select(*cols).distinct()
    d = d.repartitionByRange(n_parts, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    local = d.withColumn("_lrk", F.row_number().over(w))
    sizes = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy()
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    ranked = local.join(F.broadcast(offs), "_pid").select(
        *cols,
        (F.col("_off") + F.col("_lrk")).cast("long").alias(out_col),
    )
    return df.join(ranked, cols)


def _token_positions(df: DataFrame, text_col: str, id_col: str):
    toks = tokens(F.lower(F.col(text_col)))
    # a few-MB parquet input is one split: widen to the session
    # parallelism so the posexplode (one row per token) and the first
    # exchange's map side don't run on one core (guide §2.5; no-op at
    # real scale where the scan is already wide)
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    base = df.select(
        F.col(id_col).alias("d"), toks.alias("_toks")
    ).filter(F.size("_toks") > 0)
    lens = base.select(
        "d", F.size("_toks").cast("long").alias("len")
    )
    pos = base.select(
        "d", F.posexplode("_toks").alias("i", "t")
    ).select("d", F.col("i").cast("long").alias("i"), "t")
    return pos, lens


def suffix_ranks(
    df: DataFrame,
    rounds: int | str = "auto",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[DataFrame], DataFrame]:
    """Prefix-doubling construction → ``(final, per_round, lens)``:
    ``final`` is ``(d, i, r)`` where equal ``r`` ⟺ identical suffixes
    and the ascending ``(r, d, i)`` order is the generalized suffix
    array; ``per_round[k]`` is the rank table after comparing blocks of
    ``2^k`` tokens (needed for LCP lifting); ``lens`` is ``(d, len)``.

    ``rounds="auto"`` (default) sizes the doubling depth from the
    longest document — the max-length scalar is collected anyway.  An
    explicit int raises if any document has ≥ ``2^rounds`` tokens —
    ranks would then compare a truncated prefix and silently conflate
    distinct suffixes.

    Doubling STOPS EARLY (both modes) once the rank partition is
    stable: dense ranks mean the class count is ``max(r)``, classes
    only ever split, and the textbook prefix-doubling invariant says a
    partition unrefined by one doubling step is unrefined by every
    later one — so a round that leaves ``max(r)`` unchanged would have
    produced a bit-identical table, as would all rounds after it
    (checked by ``tests/test_suffixarray``'s full-depth comparison).
    At stability, equal rank ⟺ identical full suffix (content AND
    remaining length — the −1 pad splits unequal lengths before any
    stable round), which is exactly the ``final`` contract.  The class
    count rides on the per-round checkpoint scan; a fully-unique
    partition (``max(r) == #positions``) skips the confirming round
    too."""
    pos, lens = _token_positions(df, text_col, id_col)
    max_len, n_pos = lens.agg(
        F.max("len"), F.coalesce(F.sum("len"), F.lit(0))
    ).collect()[0]
    max_len = max_len or 0
    if rounds == "auto":
        rounds = max(1, int(max_len).bit_length())
    if max_len >= (1 << rounds):
        raise ValueError(
            f"document with {max_len} tokens needs more than "
            f"rounds={rounds} doubling rounds (limit {(1 << rounds) - 1})"
        )
    state = (
        _global_dense_ranks(pos, ["t"], "r")
        .select("d", "i", "r")
        .localCheckpoint(eager=True)
    )
    n_classes = (
        state.agg(F.coalesce(F.max("r"), F.lit(0))).collect()[0][0]
    )
    per_round = [state]  # per_round[k]: ranks of 2^k-token blocks
    for k in range(rounds):
        if n_classes == n_pos:
            break  # every suffix already in its own class
        b = 1 << k
        shifted = state.select(
            "d",
            (F.col("i") - F.lit(b)).alias("i"),
            F.col("r").alias("_r2"),
        )
        paired = (
            state.join(shifted, ["d", "i"], "left")
            .withColumn("_r2", F.coalesce("_r2", F.lit(-1)))
        )
        new_state = (
            _global_dense_ranks(
                paired.withColumnRenamed("r", "_r1"), ["_r1", "_r2"], "r"
            )
            .select("d", "i", "r")
            .localCheckpoint(eager=True)
        )
        new_classes = (
            new_state.agg(F.coalesce(F.max("r"), F.lit(0))).collect()[0][0]
        )
        if new_classes == n_classes:
            break  # stable partition: the new table is bit-identical
        state = new_state
        n_classes = new_classes
        per_round.append(state)
    return state, per_round, lens


def _adjacent_lcps(
    df: DataFrame,
    rounds: int | str,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """→ ``(pairs, lens)`` where ``pairs`` carries one row per pair of
    suffixes ADJACENT in generalized-suffix-array order —
    ``(pd, pi, qd, qi, plen, qlen, lcp)`` with ``lcp`` the length of
    their longest common token prefix.

    LCP by binary lifting: walk ``k = rounds-1 .. 0`` and extend by
    ``2^k`` whenever both suffixes still have a COMPLETE ``2^k`` block
    (``off + 2^k <= len``) and the blocks' round-k ranks agree — one
    bounded pair of left joins per k, never a token loop.

    With the stable-partition early stop in :func:`suffix_ranks`, an
    IDENTICAL pair (equal final rank ⟺ identical suffix, content and
    remaining length) short-circuits to ``lcp = plen − pi`` directly,
    and every NON-identical pair has ``lcp ≤ 2^(rounds_run) − 1`` —
    exactly the range the truncated lifting walk covers — so the
    result is unchanged while the walk skips the high-k rounds the
    full-depth construction would have spent joins on."""
    final, per_round, lens = suffix_ranks(
        df, rounds=rounds, text_col=text_col, id_col=id_col
    )
    sa = _global_dense_ranks(final, ["r", "d", "i"], "sa").select(
        "d", "i", "r", "sa"
    )
    nxt = sa.select(
        (F.col("sa") - 1).alias("sa"),
        F.col("d").alias("qd"),
        F.col("i").alias("qi"),
        F.col("r").alias("_qr"),
    )
    pairs = (
        sa.join(nxt, "sa")
        .select(
            F.col("d").alias("pd"),
            F.col("i").alias("pi"),
            "qd",
            "qi",
            (F.col("r") == F.col("_qr")).alias("_eq"),
        )
        .join(lens.select(F.col("d").alias("pd"), F.col("len").alias("plen")), "pd")
        .join(lens.select(F.col("d").alias("qd"), F.col("len").alias("qlen")), "qd")
        .withColumn(
            "lcp",
            F.when(F.col("_eq"), F.col("plen") - F.col("pi"))
            .otherwise(F.lit(0))
            .cast("long"),
        )
        .withColumn("cp", F.col("pi"))
        .withColumn("cq", F.col("qi"))
    )
    for k in range(len(per_round) - 2, -1, -1):
        b = 1 << k
        rk = per_round[k]
        rp = rk.select(
            F.col("d").alias("pd"),
            F.col("i").alias("cp"),
            F.col("r").alias("_rp"),
        )
        rq = rk.select(
            F.col("d").alias("qd"),
            F.col("i").alias("cq"),
            F.col("r").alias("_rq"),
        )
        pairs = (
            pairs.join(rp, ["pd", "cp"], "left")
            .join(rq, ["qd", "cq"], "left")
        )
        ok = (
            (~F.col("_eq"))
            & (F.col("cp") + b <= F.col("plen"))
            & (F.col("cq") + b <= F.col("qlen"))
            & F.col("_rp").isNotNull()
            & F.col("_rq").isNotNull()
            & (F.col("_rp") == F.col("_rq"))
        )
        # Materialize the step ONCE before touching cp/cq: `ok` reads
        # cp, and chained withColumn would re-evaluate it against the
        # already-advanced cp when updating cq (silent corruption).
        pairs = (
            pairs.withColumn("_step", F.when(ok, F.lit(b)).otherwise(F.lit(0)))
            .select(
                "pd",
                "pi",
                "qd",
                "qi",
                "_eq",
                "plen",
                "qlen",
                (F.col("lcp") + F.col("_step")).alias("lcp"),
                (F.col("cp") + F.col("_step")).alias("cp"),
                (F.col("cq") + F.col("_step")).alias("cq"),
            )
        )
    return pairs.select("pd", "pi", "qd", "qi", "plen", "qlen", "lcp"), lens


def repeated_span_histogram(
    df: DataFrame,
    rounds: int | str = "auto",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``(lcp long, n_pairs long)``: the adjacent-suffix LCP
    spectrum.  ``max(lcp)`` is the longest token sequence occurring ≥2
    times in the corpus (within or across documents); heavy mass at
    high lcp is the ExactSubstr dedup signal."""
    pairs, _ = _adjacent_lcps(df, rounds, text_col, id_col)
    return (
        pairs.groupBy("lcp")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.col("lcp"), F.col("n_pairs"))
    )


def duplicated_span_stats(
    df: DataFrame,
    min_len: int = 5,
    rounds: int | str = "auto",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr dedup accounting (Lee et al. 2021 §4.2): per
    document, how many of its tokens sit inside a span of ≥
    ``min_len`` tokens that occurs AGAIN somewhere in the corpus
    (within or across documents) — the exact token mass the dedup pass
    would cut.  → ``(doc_id, n_tokens, dup_tokens, dup_frac)``.

    A suffix ``(d, i)`` starts a duplicated span of length
    ``span = max(lcp with its SA-order neighbors)`` — any non-adjacent
    suffix pair's LCP is the min of the adjacent LCPs between them, so
    the two neighbors witness the longest repeat starting at ``i``.
    Coverage is the per-document union of the intervals
    ``[i, i+span)`` with ``span ≥ min_len``: one running-max window
    per document (partitioned on the high-cardinality doc key — no
    global sort) — the classic interval-union sum."""
    pairs, lens = _adjacent_lcps(df, rounds, text_col, id_col)
    ends = pairs.select(
        F.col("pd").alias("d"), F.col("pi").alias("i"), "lcp"
    ).unionByName(
        pairs.select(F.col("qd").alias("d"), F.col("qi").alias("i"), "lcp")
    )
    spans = (
        ends.groupBy("d", "i")
        .agg(F.max("lcp").alias("span"))
        .filter(F.col("span") >= min_len)
    )
    w_prev = (
        Window.partitionBy("d")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    covered = (
        spans.withColumn(
            "_prev_end",
            F.coalesce(
                F.max(F.col("i") + F.col("span")).over(w_prev), F.lit(0)
            ),
        )
        .withColumn(
            "_inc",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("i")
                + F.col("span")
                - F.greatest(F.col("_prev_end"), F.col("i")),
            ),
        )
        .groupBy("d")
        .agg(F.sum("_inc").alias("dup_tokens"))
    )
    return (
        lens.join(covered, "d", "left")
        .select(
            F.col("d").alias("doc_id"),
            F.col("len").alias("n_tokens"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("len"), 6
            ).alias("dup_frac"),
        )
    )
