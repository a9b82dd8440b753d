"""Training-corpus preparation operators — the document-to-training-
sequence pipeline stages an LLM data pipeline runs after dedup/quality
filtering (reference capability analog: the ML-task sample prep,
``/root/reference/src/utility_scripts/ml_tasks_prep_data.py``, which
renumbers/filters samples but predates token-window training prep).

All stages keep the repo's portability discipline: token math is
exact integer arithmetic, shingle keys are the portable md5-derived
h64, and every shuffle is keyed (no cartesian, no driver-side loops):

- :func:`chunk_documents` — sliding token-window chunking with
  overlap; chunk generation is ROW-LOCAL (HOF transform + explode).
- :func:`pack_sequences` — concat-and-split sequence packing: lay the
  corpus out in a deterministic stream order and cut every
  ``capacity`` tokens; placement is a de-skewed global prefix sum
  (within-shard window + a ≤n_shards-row offset join — the walks-rank
  pattern, no single-task global sort).
- :func:`decontaminate` — benchmark n-gram semi-join: drop training
  docs sharing any word n-gram with a held-out set (the standard
  test-set leakage scrub); one equi-join on shingle hashes.
- :func:`bm25_scores` — Okapi BM25 ranking of documents against a
  term list (k1/b defaults per Robertson & Walker); counts are exact
  integers, only the final score is floating (rounded for the oracle).
- :func:`bigram_pmi` — adjacent-bigram pointwise mutual information
  (word2phrase-style collocation mining for tokenizer/vocab building).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64
from unarxive_spark.functions.texttools import shingles, tokens

__all__ = [
    "chunk_documents",
    "pack_sequences",
    "decontaminate",
    "bm25_scores",
    "bigram_pmi",
    "kneser_ney_bigram",
    "tfidf_doc_pairs",
    "duplicate_spans",
    "bpe_merges",
    "bpe_segment",
    "unigram_lm_scores",
]


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window chunking →
    ``(id, chunk_idx int, n_tokens long, chunk_text string)``.

    Chunk ``i`` covers token offsets ``[i*step, i*step + chunk_tokens)``
    with ``step = chunk_tokens - overlap``; the last chunk may be
    short.  Chunk count and slicing are row-local integer arithmetic
    (transform + slice + explode) — the operator adds NO shuffle."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = (
        F.lit(1) + F.floor((extra + F.lit(step - 1)) / F.lit(step))
    ).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.slice(
                    toks, i * step + 1, F.lit(chunk_tokens)
                ).alias("_ctoks"),
            ),
        )
    )
    return df.select(F.col(id_col), chunk.alias("_c")).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.size("_c._ctoks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("_c._ctoks")).alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
    n_shards: int = 32,
) -> DataFrame:
    """Concat-and-split sequence packing → per-document placement
    ``(id, n_tokens, start_offset, first_seq, last_seq)``.

    Documents are concatenated in the deterministic stream order
    ``(h64(id) % n_shards, h64(id), id)`` and the token stream is cut
    every ``capacity`` tokens — the standard LLM pretraining layout
    (documents may straddle sequence boundaries; ``first_seq``/
    ``last_seq`` report the span).  The global exclusive prefix sum is
    de-skewed: a within-shard running sum plus a broadcastable
    ≤n_shards-row shard-offset join — no single-partition global
    window."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn("_h", h64(F.col("id").cast("string")))
    base = base.withColumn(
        "_sh", F.pmod(F.col("_h"), F.lit(int(n_shards)))
    )
    # both the within-shard window AND the shard-size aggregate consume
    # base; without materialization each would re-scan + re-tokenize
    # the full corpus — at 100 TB that doubles the dominant cost.  The
    # checkpointed table is narrow (id + three longs).
    base = base.localCheckpoint(eager=False)
    w_in = (
        Window.partitionBy("_sh")
        .orderBy("_h", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_loc", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    sizes = base.groupBy("_sh").agg(F.sum("n_tokens").alias("_n"))
    w_off = (
        Window.partitionBy()
        .orderBy("_sh")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_sh", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    placed = local.join(F.broadcast(offs), "_sh").select(
        F.col("id").alias(id_col),
        "n_tokens",
        (F.col("_loc") + F.col("_off")).alias("start_offset"),
    )
    cap = F.lit(int(capacity))
    first = ((F.col("start_offset") - F.pmod(F.col("start_offset"), cap)) / cap).cast("long")
    last_off = F.col("start_offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    last = ((last_off - F.pmod(last_off, cap)) / cap).cast("long")
    return placed.select(
        id_col,
        "n_tokens",
        "start_offset",
        first.alias("first_seq"),
        last.alias("last_seq"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Drop training documents sharing ANY word ``n``-gram with the
    benchmark set → the surviving ``train`` rows (all columns).

    Both sides shingle (lowercased word n-grams, the dedup family's
    :func:`shingles`), keys are h64 hashes; contamination is one
    equi-semi-join on the hash and the scrub is a left_anti back to
    ``train``.  At scale the benchmark side is tiny — broadcast."""
    # shingling is explode-heavy: widen a narrow scan up front so the
    # map side parallelizes (single-file parquet trap, dedup.py:322;
    # AQE re-coalesces if the input was already wide)
    train = train.repartition(
        train.sparkSession.sparkContext.defaultParallelism
    )
    sh = F.explode(
        F.transform(
            shingles(F.col(text_col), n), lambda s: h64(s)
        )
    )
    tr = train.select(F.col(id_col).alias("_id"), sh.alias("_sh"))
    bn = F.broadcast(
        bench.select(sh.alias("_sh")).distinct()
    )
    contaminated = (
        tr.join(bn, "_sh", "left_semi").select("_id").distinct()
    )
    return train.join(
        contaminated,
        train[id_col] == contaminated["_id"],
        "left_anti",
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 → ``(id, n_hits long, bm25 double)`` for documents
    containing at least one query term.

    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` (the non-negative
    variant).  All counts (tf, df, dl, N) are exact integers; ``avgdl``
    and the score are the only floats.  Plan: one explode+groupBy for
    per-(doc, term) tf, a terms-sized df aggregate (AQE broadcasts it
    when it fits) and two 1-row scalars (N, avgdl) joined broadcast —
    no window, no cartesian."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(F.lower(F.col(text_col)))
    docs = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("dl"),
    )
    term_arr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    tf = (
        docs.select(
            "id",
            "dl",
            F.explode(
                F.array_intersect(F.array_distinct("_toks"), term_arr)
            ).alias("term"),
        )
        .join(
            docs.select(
                "id", F.explode("_toks").alias("term")
            )
            .groupBy("id", "term")
            .agg(F.count(F.lit(1)).alias("tf")),
            ["id", "term"],
        )
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("id").alias("df")
    )
    scalars = F.broadcast(
        docs.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    # dfreq is vocabulary-sized (unbounded at corpus scale): no forced
    # broadcast — AQE picks broadcast at runtime when it actually fits
    return (
        tf.join(dfreq, "term")
        .crossJoin(scalars)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.sum(contrib).alias("_s"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_hits",
            F.round("_s", 6).alias("bm25"),
        )
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Adjacent-bigram pointwise mutual information — the phrase-mining
    pass of tokenizer/vocab building (word2phrase-style collocation
    detection) → ``(token_a, token_b, c_ab, c_a, c_b, pmi)``.

    ``pmi = ln(p(a,b) / (p(a)·p(b)))`` with ``p(a,b) = c_ab/N_bi`` and
    ``p(a) = c_a/N_uni``.  All counts are exact integers (the row set
    is exact under ``min_count``); only the pmi value is floating —
    computed with an identical left-associated expression in the DuckDB
    oracle and rounded to 6.

    Plan: bigram generation is row-local (HOF over the token array);
    two map-side-combinable groupBy counts, two unigram-count joins
    (vocabulary-sized: AQE broadcasts them at runtime when they fit),
    two 1-row scalar aggregates — no window, no cartesian."""
    toks = tokens(F.lower(F.col(text_col)))
    d = df.select(toks.alias("_toks"))
    uni = d.select(F.explode("_toks").alias("t"))
    cu = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    bi = d.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 2),
                lambda i: F.struct(
                    F.col("_toks")[i].alias("a"),
                    F.col("_toks")[i + 1].alias("b"),
                ),
            )
        ).alias("_bg")
    ).select(
        F.col("_bg.a").alias("token_a"), F.col("_bg.b").alias("token_b")
    )
    cb = (
        bi.groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= int(min_count))
    )
    scalars = F.broadcast(
        uni.agg(F.count(F.lit(1)).alias("n_uni")).crossJoin(
            bi.agg(F.count(F.lit(1)).alias("n_bi"))
        )
    )
    pmi = F.log(
        (
            F.col("c_ab").cast("double")
            * F.col("n_uni")
            * F.col("n_uni")
        )
        / (
            F.col("n_bi").cast("double")
            * F.col("c_a")
            * F.col("c_b")
        )
    )
    # cu is vocabulary-sized (unbounded at corpus scale): no forced
    # broadcast — AQE picks broadcast at runtime when it actually fits
    return (
        cb.join(
            cu.select(
                F.col("t").alias("token_a"), F.col("c").alias("c_a")
            ),
            "token_a",
        )
        .join(
            cu.select(
                F.col("t").alias("token_b"), F.col("c").alias("c_b")
            ),
            "token_b",
        )
        .crossJoin(scalars)
        .select(
            "token_a",
            "token_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(pmi, 6).alias("pmi"),
        )
    )


def kneser_ney_bigram(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model (Kneser & Ney
    1995) — the classic n-gram smoothing behind corpus-quality
    perplexity filters (the bigram upgrade of q100's unigram LM):

        P_KN(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
                      + (D·N1+(w1,·)/c(w1·)) · N1+(·,w2)/N1+(··)

    where ``c(w1·)`` is the left-context total, ``N1+(w1,·)`` the
    distinct continuation types after w1, ``N1+(·,w2)`` the distinct
    left contexts of w2 (the continuation probability numerator), and
    ``N1+(··)`` the number of distinct bigram types.

    → ``(w1, w2, c12, c1, n_follow, n_prec, pkn)``, rows filtered to
    ``c12 ≥ min_count`` AFTER all statistics are taken over the full
    corpus.  All inputs to ``pkn`` are exact integers; the float
    expression is written with the identical association in the DuckDB
    oracle (D = 0.75 is binary-exact), so the rounded value matches
    bit-for-bit.

    Plan: bigrams are row-local (HOF over the token array); the model
    is three map-side-combinable groupBy counts over the bigram-type
    table + one 1-row scalar — no window, no cartesian on data."""
    toks = tokens(F.lower(F.col(text_col)))
    bi = (
        df.select(toks.alias("_toks"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_toks") - 2),
                    lambda i: F.struct(
                        F.col("_toks")[i].alias("a"),
                        F.col("_toks")[i + 1].alias("b"),
                    ),
                )
            ).alias("_bg")
        )
        .select(F.col("_bg.a").alias("w1"), F.col("_bg.b").alias("w2"))
    )
    cb = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left = cb.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n_follow"),
    )
    prec = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("n_prec"))
    n_types = F.broadcast(
        cb.agg(F.count(F.lit(1)).alias("n_types"))
    )
    d = float(discount)
    pkn = (
        F.greatest(F.col("c12").cast("double") - F.lit(d), F.lit(0.0))
        / F.col("c1")
        + (F.lit(d) * F.col("n_follow") / F.col("c1"))
        * (F.col("n_prec").cast("double") / F.col("n_types"))
    )
    # left/prec are vocabulary-sized (unbounded at corpus scale): no
    # forced broadcast — AQE picks broadcast at runtime when it fits
    return (
        cb.filter(F.col("c12") >= int(min_count))
        .join(left, "w1")
        .join(prec, "w2")
        .crossJoin(n_types)
        .select(
            "w1",
            "w2",
            "c12",
            F.col("c1").cast("long").alias("c1"),
            F.col("n_follow").cast("long").alias("n_follow"),
            F.col("n_prec").cast("long").alias("n_prec"),
            F.round(pkn, 6).alias("pkn"),
        )
    )


def tfidf_doc_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """TF-IDF cosine similarity between document pairs →
    ``(id_a, id_b, n_shared long, cosine double)``.

    Weight ``w(d,t) = tf · ln(N/df)``; pairs are generated by the
    inverted-index equi-join on term (the dedup family's candidate
    shape — no cartesian) and gated by EXACT INTEGER predicates so the
    row set is engine-stable: ``n_shared`` co-occurring index terms ≥
    ``min_shared``, and terms with ``df > max_df`` are dropped from the
    PAIR-GENERATION index (impact-ordered stop-term pruning: ubiquitous
    terms carry idf ≈ 0 AND blow up the hot join keys, so dropping them
    bounds candidates at scale while barely moving the dot product).
    Norms stay FULL-vocabulary, so the reported cosine is the true
    cosine restricted to the index terms in the numerator.  The cosine
    is the only float (rounded to 6).
    """
    toks = tokens(F.lower(F.col(text_col)))
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = F.broadcast(
        df.select(F.col(id_col)).distinct().agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        )
    )
    # dfreq is vocabulary-sized (unbounded at corpus scale): no forced
    # broadcast — AQE picks broadcast at runtime when it actually fits
    w = (
        tf.join(dfreq, "t")
        .crossJoin(n_docs)
        .select(
            "id",
            "t",
            "df",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    idx = w if max_df is None else w.filter(F.col("df") <= int(max_df))
    pairs = (
        idx.alias("l")
        .join(
            idx.alias("r"),
            (F.col("l.t") == F.col("r.t"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum(F.col("l.w") * F.col("r.w")).alias("dot"),
        )
        .filter(F.col("n_shared") >= int(min_shared))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("_na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("_nb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("dot") / (F.col("_na") * F.col("_nb")), 6
            ).alias("cosine"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 50,
) -> DataFrame:
    """Exact duplicate-span detection (the window-hash form of
    ExactSubstr dedup, Lee et al. 2021 "Deduplicating Training Data
    Makes Language Models Better") → per-document
    ``(id, n_windows, n_dup_windows, dup_frac)``.

    Every ``window``-token sliding window (stride 1) is hashed with the
    portable h64; a window is DUPLICATED if its hash occurs at more
    than one (doc, offset) position corpus-wide.  Window generation is
    row-local (one hash row per token position — the same row scale as
    any token-level op); the duplicate set is one map-side-combinable
    groupBy over the hashes plus a semi-join back.  Documents shorter
    than ``window`` tokens hash their full text (so exact whole-doc
    duplicates still flag).  All counts exact integers; ``dup_frac``
    is the only float (rounded to 6)."""
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(window), F.lit(0))
    )
    win_hashes = F.transform(
        starts,
        lambda i: h64(
            F.concat_ws(" ", F.slice(toks, i + 1, F.lit(window)))
        ),
    )
    # window hashing is O(tokens × window) md5 work and feeds THREE
    # consumers (dup set, flag semi-join, per-doc totals) — widen the
    # one-split small-file scan to the session parallelism and
    # materialize the hash table ONCE so the transform is not
    # re-evaluated per consumer (guide §2.5, §2.4; the hash table is
    # one 3-column row per token position — the same row scale any
    # token-level op already shuffles)
    wins = (
        df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(win_hashes).alias("pos", "wh"),
        )
        .localCheckpoint(eager=True)
    )
    dup_hashes = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("wh")
    )
    flagged = wins.join(dup_hashes, "wh", "left_semi")
    per_doc = (
        wins.groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_windows"))
        .join(
            flagged.groupBy("id").agg(
                F.count(F.lit(1)).cast("long").alias("n_dup_windows")
            ),
            "id",
            "left",
        )
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return per_doc.withColumn(
        "dup_frac",
        F.round(
            F.col("n_dup_windows") / F.col("n_windows").cast("double"), 6
        ),
    )


# BPE merge learning works on a delimited-string representation of each
# document's token sequence: every token is wrapped as \x01tok\x01 and
# tokens concatenated, so merging the pair (a, b) is one literal
# replace of \x01a\x01\x01b\x01 with \x01ab\x01 — a LEFT-TO-RIGHT
# NON-OVERLAPPING scan in both Spark (UTF8String.replace) and DuckDB
# (replace), which is exactly the greedy BPE apply order.
_BPE_SEP = "\x01"


def _bpe_state(df: DataFrame, text_col: str) -> DataFrame:
    """documents → one wrapped token-stream string per document."""
    raw = F.translate(F.col(text_col), _BPE_SEP, "")
    toks = tokens(F.lower(raw))
    return (
        df.select(toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            F.concat(
                F.lit(_BPE_SEP),
                F.concat_ws(_BPE_SEP + _BPE_SEP, F.col("_toks")),
                F.lit(_BPE_SEP),
            ).alias("s")
        )
    )


def _bpe_pairs(state: DataFrame) -> DataFrame:
    """wrapped strings → (a, b, c) adjacent-pair counts."""
    arr = F.split(
        F.expr("substring(s, 2, length(s) - 2)"), _BPE_SEP + _BPE_SEP
    )
    seq = F.when(
        F.size(arr) >= 2, F.sequence(F.lit(0), F.size(arr) - 2)
    ).otherwise(F.array().cast("array<int>"))
    pairs = F.explode(
        F.transform(
            seq,
            lambda i: F.struct(
                arr[i].alias("a"), arr[i + 1].alias("b")
            ),
        )
    )
    return (
        state.select(pairs.alias("_p"))
        .select(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bpe_merges(
    df: DataFrame, n_merges: int = 4, text_col: str = "text"
) -> DataFrame:
    """Distributed byte-pair-encoding merge learning (Sennrich et al.
    2016 — the tokenizer-training pass of an LLM data pipeline) →
    the learned merge table ``(merge_rank int, token_a, token_b,
    pair_count long)``.

    Each round: count adjacent token pairs corpus-wide (explode +
    map-side-combinable groupBy), pick the most frequent pair with the
    deterministic tie-break ``(count desc, a asc, b asc)``, merge every
    left-to-right non-overlapping occurrence (one literal ``replace``
    on the wrapped-string state — row-local, no shuffle), repeat.  The
    per-round argmax is the ONLY driver-side value (a 1-row merge
    rule — metadata-sized loop control, the same discipline as the IVF
    probe list).

    The tokenized corpus is localCheckpointed ONCE; each learned merge
    is a cheap row-local ``replace`` CHAINED lazily in front of the
    next round's count pass instead of being materialized on its own
    (guide §1.2/§2.4: one full pass per round, not two — replaying the
    short replace chain over the checkpointed base is far cheaper than
    writing the whole corpus back out every round, and the learned
    rules are byte-identical because the composed expression is the
    same left-to-right replace sequence, exactly as ``bpe_segment``
    applies it).

    Raises if the corpus runs out of adjacent pairs before
    ``n_merges`` rounds (keeps engine and fixed-depth oracle in
    lockstep — no silent truncation)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    # a few-MB parquet input is ONE split, and the checkpointed state
    # inherits it — every pair-count pass would then explode the whole
    # corpus on one core (measured 6.4 s/pass → 1.5 s at sf0.1).  Widen
    # to the session parallelism before materializing (guide §2.5
    # input skew / §6 split sizing; no-op at real scale where the scan
    # is already wide).
    base = (
        _bpe_state(df, text_col)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    s_col = F.col("s")
    rules = []
    for rank in range(1, int(n_merges) + 1):
        state = base.select(s_col.alias("s"))
        top = (
            _bpe_pairs(state)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            raise ValueError(
                f"corpus exhausted adjacent pairs after {rank - 1} merges"
            )
        a, b, c = top[0]["a"], top[0]["b"], top[0]["c"]
        rules.append((rank, a, b, int(c)))
        pat = _BPE_SEP + a + _BPE_SEP + _BPE_SEP + b + _BPE_SEP
        rep = _BPE_SEP + a + b + _BPE_SEP
        s_col = F.replace(s_col, F.lit(pat), F.lit(rep))
    # the learned rules are driver-side — the result has NO lineage on
    # the checkpointed corpus, so its blocks can be dropped eagerly
    # (keeps long shared sessions from accumulating dead cached state)
    base.unpersist()
    return spark.createDataFrame(
        rules,
        "merge_rank int, token_a string, token_b string, pair_count long",
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to documents → ``(id, bpe_tokens
    array<string>, n_bpe_tokens long)``.  Row-local (a chain of literal
    replaces on the wrapped-string form, in merge order) — the operator
    adds no shuffle; at scale this is the tokenization map stage."""
    raw = F.translate(F.col(text_col), _BPE_SEP, "")
    toks = tokens(F.lower(raw))
    s = F.concat(
        F.lit(_BPE_SEP),
        F.concat_ws(_BPE_SEP + _BPE_SEP, toks),
        F.lit(_BPE_SEP),
    )
    for a, b in merges:
        pat = _BPE_SEP + a + _BPE_SEP + _BPE_SEP + b + _BPE_SEP
        rep = _BPE_SEP + a + b + _BPE_SEP
        s = F.replace(s, F.lit(pat), F.lit(rep))
    arr = F.when(
        F.size(toks) > 0,
        F.split(
            F.substring(s, 2, F.length(s) - 2),
            _BPE_SEP + _BPE_SEP,
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col),
        arr.alias("bpe_tokens"),
        F.size(arr).cast("long").alias("n_bpe_tokens"),
    )


def unigram_lm_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained add-one unigram language model scoring each
    document → ``(id, n_tokens long, cross_entropy double,
    perplexity double)`` — the LM-perplexity quality filter of a
    training-data pipeline (CCNet-style: documents whose perplexity
    under a corpus LM is extreme get dropped; reference quality analog:
    the per-paper length/section stats of
    ``/root/reference/src/utility_scripts/calc_stats.py``).

    ``p(t) = (c_t + 1) / (N + V)`` with integer ``c_t`` (corpus term
    count), ``N`` (corpus token count), ``V`` (vocabulary size);
    ``cross_entropy(d) = (n_d·ln(N + V) − Σ_t tf_dt·ln(c_t + 1)) /
    n_d`` — every input to each ``ln`` is an exact integer, so both
    engines evaluate identical expressions and only the final sums are
    floating (rounded to 6).

    Plan: one explode+groupBy for per-(doc, term) tf, one groupBy for
    corpus counts, a broadcast 1-row (N, V) scalar — the tf↔counts
    join shuffles on the term key (vocabulary-sized right side; NOT
    broadcast, a 100-TB corpus vocabulary is data-sized), then a
    map-side-combinable per-doc aggregate."""
    toks = tokens(F.lower(F.col(text_col)))
    docs = df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    tf = (
        docs.select("id", F.explode("_toks").alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cnt = tf.groupBy("t").agg(F.sum("tf").cast("long").alias("c"))
    scalars = F.broadcast(
        cnt.agg(
            F.sum("c").cast("long").alias("_n_total"),
            F.count(F.lit(1)).cast("long").alias("_vocab"),
        )
    )
    lnz = F.log(F.col("_n_total") + F.col("_vocab"))
    ce = (
        F.col("n_tokens") * lnz - F.col("_s")
    ) / F.col("n_tokens")
    return (
        tf.join(cnt, "t")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(
                F.col("tf") * F.log(F.col("c") + F.lit(1))
            ).alias("_s"),
        )
        .crossJoin(scalars)
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round(ce, 6).alias("cross_entropy"),
            F.round(F.exp(ce), 6).alias("perplexity"),
        )
    )


def skipgram_pmi(
    df: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Skip-gram co-occurrence PMI: PMI over ordered token pairs at
    distance 1..``window`` — the word2vec-style context association
    the adjacent-bigram pass (:func:`bigram_pmi`) cannot see
    → ``(token_a, token_b, c_ab, c_a, c_b, pmi)``.

    ``pmi = ln(p(a,b) / (p(a)·p(b)))`` with ``p(a,b) = c_ab/N_pairs``
    and ``p(w) = c_w/N_uni``.  Row set exact (integer counts under
    ``min_count``); pmi is the only float — identical left-associated
    expression in the DuckDB oracle, rounded to 6.

    Plan: pair generation is row-local (nested HOF: offsets 1..w ×
    positions — named factory per the single-parameter-lambda
    discipline); then the same count/broadcast-join shape as
    :func:`bigram_pmi`.  Shuffle-free until the pair groupBy.
    """
    toks = tokens(F.lower(F.col(text_col)))
    d0 = df.select(toks.alias("_toks"))
    uni = d0.select(F.explode("_toks").alias("t"))
    cu = uni.groupBy("t").agg(F.count(F.lit(1)).alias("c"))

    def _pairs_at(o):
        # o is the outer HOF lambda's variable; inner lambda stays
        # single-parameter (i) and closes over it.
        return F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 1 - o),
            lambda i: F.struct(
                F.col("_toks")[i].alias("a"),
                F.col("_toks")[i + o].alias("b"),
            ),
        )

    pairs = (
        d0.filter(F.size("_toks") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(int(window)), F.size("_toks") - 1
                            ),
                        ),
                        _pairs_at,
                    )
                )
            ).alias("_p")
        )
        .select(
            F.col("_p.a").alias("token_a"), F.col("_p.b").alias("token_b")
        )
    )
    cp = (
        pairs.groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= int(min_count))
    )
    scalars = F.broadcast(
        uni.agg(F.count(F.lit(1)).alias("n_uni")).crossJoin(
            pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
        )
    )
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni"))
        / (F.col("n_pairs").cast("double") * F.col("c_a") * F.col("c_b"))
    )
    # cu is vocabulary-sized (unbounded at corpus scale): no forced
    # broadcast — AQE picks broadcast at runtime when it actually fits
    return (
        cp.join(
            cu.select(
                F.col("t").alias("token_a"), F.col("c").alias("c_a")
            ),
            "token_a",
        )
        .join(
            cu.select(
                F.col("t").alias("token_b"), F.col("c").alias("c_b")
            ),
            "token_b",
        )
        .crossJoin(scalars)
        .select(
            "token_a",
            "token_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(pmi, 6).alias("pmi"),
        )
    )


def dsir_scores(
    df: DataFrame,
    is_target: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    NON-target document by the log-likelihood ratio of a hashed
    unigram LM fit on the target slice vs one fit on the pool
    → ``(doc_id, n_tokens, score_e6, score)``.

    Integer discipline: per-bucket weight is
    ``round(1e6 · ln((ct+1)(Tr+B) / ((cr+1)(Tt+B))))`` stored as
    BIGINT (one ln of a ratio of exact integers — the q107
    adamic-adar rounding contract), so the per-doc score is an exact
    BIGINT sum, independent of float summation order.

    Plan: one token explode, one ≤``n_buckets``-row weight table
    (broadcast), one groupBy per doc.  The weight table is
    metadata-sized at any corpus scale.
    """
    toks = tokens(F.lower(F.col(text_col)))
    ex = df.select(
        F.col(id_col).alias("id"),
        F.col(is_target).alias("_tgt"),
        F.explode(toks).alias("t"),
    ).withColumn("_b", F.pmod(h64(F.col("t")), F.lit(int(n_buckets))))
    per_bucket = ex.groupBy("_b").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("cr"),
    )
    totals = F.broadcast(
        ex.agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("tt"),
            F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("tr"),
        )
    )
    b = F.lit(int(n_buckets)).cast("double")
    w_e6 = F.round(
        F.lit(1e6)
        * F.log(
            ((F.col("ct") + 1).cast("double") * (F.col("tr") + b))
            / ((F.col("cr") + 1).cast("double") * (F.col("tt") + b))
        )
    ).cast("long")
    weights = per_bucket.crossJoin(totals).select(
        "_b", w_e6.alias("_w")
    )
    return (
        ex.filter(~F.col("_tgt"))
        .join(F.broadcast(weights), "_b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_w").alias("score_e6"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "score_e6",
            F.round(F.col("score_e6") / 1e6, 6).alias("score"),
        )
    )


def top_phrase_occurrences(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional phrase search over the corpus's own argmax phrase:
    find the most frequent ``n``-gram (tie → lexicographically
    smallest) and return every occurrence
    → ``(doc_id, pos, phrase, n_total)``.

    The self-contained argmax keeps the query deterministic at every
    scale factor (a fixed literal phrase could go extinct as the
    corpus changes).  Plan: row-local n-gram generation (HOF slice —
    the positional inverted index), one count groupBy, two 1-row
    scalar aggregates (max count, then min phrase at that count — the
    accepted broadcast-scalar pattern), one broadcast equi-join back.
    No window, no cartesian on data-sized tables.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens(F.lower(F.col(text_col)))
    grams = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_toks") - n),
                    lambda i: F.struct(
                        i.cast("long").alias("pos"),
                        F.concat_ws(
                            " ", F.slice("_toks", i + 1, n)
                        ).alias("phrase"),
                    ),
                )
            ).alias("_g"),
        )
        .select("doc_id", F.col("_g.pos"), F.col("_g.phrase"))
    )
    counts = grams.groupBy("phrase").agg(F.count(F.lit(1)).alias("c"))
    mx = F.broadcast(counts.agg(F.max("c").alias("_mx")))
    best = F.broadcast(
        counts.crossJoin(mx)
        .filter(F.col("c") == F.col("_mx"))
        .agg(
            F.min("phrase").alias("phrase"),
            F.max("c").alias("n_total"),
        )
    )
    return grams.join(best, "phrase").select(
        "doc_id", "pos", "phrase", "n_total"
    )
