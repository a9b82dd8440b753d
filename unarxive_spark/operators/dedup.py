"""Deduplication suite for training-data pipelines (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design: every method reduces to *candidate generation by key equality*
(hash bucket / band / simhash block) followed by *verification* — i.e.
shuffles only on compact keys, never all-pairs. All hashing is the
portable md5-derived :mod:`unarxive_spark.functions.hashing` so the
DuckDB oracle reproduces bucket assignments bit-for-bit.

Reference precedent: content-hash identity dedup —
``sha1(normalized_text + scope)`` keys collapsing identical bib entries
(/root/reference/src/parse_latex_tralics.py:460-474).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64, minhash_term
from unarxive_spark.functions.texttools import shingles, tokens


# ---------- exact ----------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per exact (whitespace-normalized)
    text hash. One shuffle on the 60-bit hash key."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    keyed = df.withColumn("_k", h64(norm))
    w = Window.partitionBy("_k").orderBy(F.col(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(hash, n_dups, representative) for groups with >1 member."""
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        df.select(h64(norm).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("representative"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------- MinHash + LSH ----------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig array<long>[n_perm]) — min over salted shingle hashes.

    Stays columnar: shingling + per-permutation min happen inside array
    HOFs (``transform``/``array_min``) — no explode, no Python.
    """
    sh = shingles(text_col, k=shingle_k)

    # NB: single-parameter lambdas only — a `lambda s, p=p:` closure makes
    # PySpark bind the second param to the array INDEX column.
    def perm_min(p: int):
        return F.array_min(F.transform(sh, lambda s: minhash_term(s, p)))

    sig = F.array(*[perm_min(p) for p in range(n_perm)])
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs sharing any band of
    rows_per_band consecutive signature slots. Returns (id_a, id_b,
    est_jaccard) with id_a < id_b; est_jaccard = matching-perm fraction.

    Scale shape: explode to (band_key, id) — |docs|×bands rows — then a
    self-join *within buckets only* (equi-join on band hash), never
    all-pairs.
    """
    rows_per_band = n_perm // bands
    sigs = minhash_signature(df, text_col, id_col, n_perm, shingle_k)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.sha1(
                            F.concat_ws(
                                "|",
                                F.lit(b),
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.bkey").alias("bkey"))
    pairs = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(n_perm))
    )
    return pairs.select("id_a", "id_b", est.alias("est_jaccard"))


# ---------- SimHash ----------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash long): sign-aggregated token hashes.

    Bit b of the signature = 1 iff Σ_tokens sign(bit b of h64(token)) > 0.
    Columnar: per-bit tallies via aggregate() HOF over the token array.
    """
    toks = tokens(F.lower(F.col(text_col)))
    hashes = F.transform(toks, lambda t: h64(t))

    def bit_tally(b: int):
        # factory keeps the aggregate lambda strictly 2-parameter
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b) % 2 == 1, 1).otherwise(-1),
        )

    bit_exprs = []
    for b in range(bits):
        tally = bit_tally(b)
        bit_exprs.append(
            F.when(tally > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
        )
    sig = sum(bit_exprs[1:], bit_exprs[0])
    return df.select(F.col(id_col).alias("id"), sig.alias("simhash"))


def simhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: split the signature into ``blocks`` chunks; any
    pair within hamming ≤ blocks-1 shares ≥1 exact chunk → candidate join
    on chunk value, then exact hamming verification via bit_count(xor).
    The recall guarantee requires ``max_hamming <= blocks - 1`` — raise
    rather than silently losing qualifying pairs (ADVICE r4).
    """
    if max_hamming > blocks - 1:
        raise ValueError(
            f"simhash_dup_pairs: max_hamming={max_hamming} needs "
            f"blocks >= {max_hamming + 1} (got {blocks}) — pigeonhole "
            "blocking only guarantees recall for hamming <= blocks-1"
        )
    sigs = simhash(df, text_col, id_col, bits)
    chunk = bits // blocks
    mask = (1 << chunk) - 1
    blocked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        (
                            F.shiftright("simhash", i * chunk)
                            % F.lit(mask + 1)
                        ).alias("bval"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.blk").alias("blk"), F.col("b.bval").alias("bval"))
    cands = (
        blocked.alias("l")
        .join(
            blocked.alias("r"),
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cands.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# ---------- n-gram Jaccard ----------


# Relative slack on the length-filter comparison: the real-arithmetic
# bound min(|A|,|B|) >= t*max(|A|,|B|) is implied by J >= t; the slack
# absorbs double-rounding of t*n so boundary pairs (J exactly t) are
# never dropped. False positives are fine — verification is exact.
_LEN_EPS = 1e-9


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    prefix_filter: bool = False,
    length_filter: bool = True,
    positional: bool = False,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word k-shingles for pairs sharing ≥1 shingle.

    ``max_df`` (default None = exact) caps posting-list skew: shingles
    occurring in more than ``max_df`` documents are dropped from the
    computation entirely, so the reported score is the EXACT Jaccard of
    the df-capped shingle sets.  A boilerplate shingle shared by
    millions of documents otherwise costs a df² posting-list self-join
    while carrying no dedup signal (the same impact-ordered pruning
    argument as ``tfidf_doc_pairs``); the tradeoff — pairs similar ONLY
    through capped shingles are missed, and scores shift toward the
    rare-shingle overlap — is pinned by a fixture test.

    Shuffle shape: explode distinct shingles → self-join on shingle
    (inverted index), count shared per pair, |A∪B| = |A|+|B|-shared.
    Quadratic only within identical-shingle posting lists — the standard
    inverted-index verification join. Both filters below are LOSSLESS
    (results identical to the plain path, asserted in tests):

    ``length_filter`` (default on): J(A,B) ≥ t implies
    ``t·|B| ≤ |A| and t·|A| ≤ |B|`` (since J ≤ min/max), folded into the
    candidate-join condition — wildly mismatched sizes never pair, which
    prunes exactly the hub-document fan-out a low threshold admits.

    ``prefix_filter=True`` adds PPJoin prefix filtering: under a global
    shingle order, two sets with J ≥ t must collide within each other's
    first ``|d| - ⌈t·|d|⌉ + 1`` shingles. The order here is **ascending
    document frequency** (ties by shingle) — the canonical PPJoin choice:
    a stop-shingle with a mega posting list sorts LAST, so it is dropped
    from almost every prefix and its quadratic posting-list self-join
    disappears from candidate generation entirely. Verification still
    counts shared shingles over the FULL sets.

    ``positional=True`` (requires ``prefix_filter``) adds the PPJoin
    POSITIONAL upper bound: a collision at prefix ranks (i, j) caps the
    total overlap at ``min(i,j)-1 + 1 + min(|A|-i, |B|-j)`` (tokens
    before the collision can overlap at most min(i,j)-1 times under the
    shared global order; tokens after at most min-remaining). Pairs
    where EVERY collision's cap falls below the required overlap
    ``t·(|A|+|B|)/(1+t)`` are dropped before verification — LOSSLESS
    (the cap is a true upper bound, so any qualifying pair passes at
    each of its collisions), and at low thresholds it prunes the
    many-collision candidate tail the plain prefix filter admits.

    Crossover: at small corpora (≤10⁴ docs) the extra df-join + rank
    window + verification join can cost more than the quadratic term
    saves; at web scale the candidate join dominates and both filters
    are the standard fix.

    Posting lists join on the 60-bit portable shingle hash, not the
    shingle string — an 8-byte fixed-width join key instead of a ~20-byte
    UTF8 one (same shuffle count, much cheaper compare/serialize; h64
    collisions at 2^60 are ~|vocab|²/2^61, negligible and deterministic).
    """
    # The explode inflates ~|shingles/doc|×: if the input arrived in fewer
    # partitions than cores (single small parquet file), the whole map
    # side would run on those few cores — widen it unconditionally (the
    # old getNumPartitions() probe forced plan materialization on some
    # lineages; AQE re-coalesces if the input was already wide).
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, k=k)).alias("_s"),
        )
        .select("id", h64(F.col("_s")).alias("shingle"))
        .distinct()
    )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= int(max_df))
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))

    def _join_cond():
        cond = (F.col("l.shingle") == F.col("r.shingle")) & (
            F.col("l.id") < F.col("r.id")
        )
        if length_filter:
            cond = (
                cond
                & (
                    F.col("l.n_sh") * F.lit(1.0 + _LEN_EPS)
                    >= F.lit(threshold) * F.col("r.n_sh")
                )
                & (
                    F.col("r.n_sh") * F.lit(1.0 + _LEN_EPS)
                    >= F.lit(threshold) * F.col("l.n_sh")
                )
            )
        return cond

    if prefix_filter:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        ranked = (
            sh.join(dfreq, "shingle")
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("id").orderBy(
                        F.asc("_df"), F.asc("shingle")
                    )
                ),
            )
            .join(sizes, "id")
        )
        prefix_len = (
            F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        prefix = ranked.filter(F.col("_rk") <= prefix_len).select(
            "id", "shingle", "n_sh", "_rk"
        )
        cond = _join_cond()
        if positional:
            # overlap cap at this collision ≥ required overlap, with the
            # same multiplicative epsilon guard as the length filter
            cap = (
                F.least(F.col("l._rk"), F.col("r._rk"))
                - 1
                + F.least(
                    F.col("l.n_sh") - F.col("l._rk"),
                    F.col("r.n_sh") - F.col("r._rk"),
                )
                + 1
            )
            required = (
                F.lit(threshold)
                * (F.col("l.n_sh") + F.col("r.n_sh"))
                / F.lit(1.0 + threshold)
            )
            cond = cond & (cap * F.lit(1.0 + _LEN_EPS) >= required)
        cands = (
            prefix.alias("l")
            .join(prefix.alias("r"), cond)
            .select(
                F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")
            )
            .distinct()
        )
        # exact verification over the FULL shingle sets of candidates:
        # expand by A's shingles, keep those also in B's set, count
        shared = (
            cands.join(
                sh.select(F.col("id").alias("id_a"), "shingle"), "id_a"
            )
            .join(
                sh.select(F.col("id").alias("id_b"), "shingle"),
                ["id_b", "shingle"],
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    else:
        shs = sh.join(sizes, "id")
        shared = (
            shs.alias("l")
            .join(shs.alias("r"), _join_cond())
            .groupBy(
                F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    return (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------- embedding cosine ----------


def embedding_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
    exact: bool = False,
) -> DataFrame:
    """Near-dup pairs by cosine similarity ≥ threshold.

    Default path is **banded hyperplane LSH**: each vector is sketched
    into ``n_bands`` independent sign-sketch buckets (``planes_per_band``
    hyperplanes each, per-band seeds); candidates are pairs sharing ANY
    band bucket — an **equi-join on (band, bucket)**, never all-pairs —
    then verified with the exact columnar cosine. Candidate-generation
    recall for a pair at cosine c is ``1-(1-p^r)^b`` with
    ``p = 1 - arccos(c)/π``; at the defaults and c=0.95 that is ~0.9998
    (and exactly 1 for identical vectors, which share every band).

    ``exact=True`` is the brute-force all-pairs verifier — O(n²), kept
    ONLY as the small-N test oracle; the default plan must never produce
    a CartesianProduct (asserted in tests/test_plan_shapes.py).
    """
    from unarxive_spark.operators.similarity import hyperplane_sketch

    norm = F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm.alias("norm"),
    ).filter(F.col("norm") > 0)

    if exact:
        pairs = v.alias("l").join(
            v.alias("r"), F.col("l.id") < F.col("r.id")
        )
    else:
        banded = v.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            hyperplane_sketch(
                                F.col("vec"),
                                planes_per_band,
                                dim,
                                seed=1000 + b,
                            ).alias("bucket"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        cand_ids = (
            banded.alias("lb")
            .join(
                banded.alias("rb"),
                (F.col("lb.band") == F.col("rb.band"))
                & (F.col("lb.bucket") == F.col("rb.bucket"))
                & (F.col("lb.id") < F.col("rb.id")),
            )
            .select(
                F.col("lb.id").alias("cid_a"), F.col("rb.id").alias("cid_b")
            )
            .dropDuplicates(["cid_a", "cid_b"])
        )
        pairs = (
            cand_ids.join(
                v.alias("l"), F.col("cid_a") == F.col("l.id")
            ).join(v.alias("r"), F.col("cid_b") == F.col("r.id"))
        )

    dot = F.aggregate(
        F.zip_with(
            F.col("l.vec"),
            F.col("r.vec"),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return pairs.select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        (dot / (F.col("l.norm") * F.col("r.norm"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs → clusters → one survivor per cluster.

    The step every dedup pipeline needs AFTER candidate verification:
    near-duplicate relations are not transitive pairwise decisions — A~B
    and B~C must collapse into ONE kept document even when A~C was never
    generated.  Clusters are the connected components of the pair graph
    (hash-min supersteps with pointer jumping, ``operators/components``);
    the survivor is the MINIMUM id in each cluster (deterministic,
    content-addressed — no rand()).

    → ``(id_col, cluster_rep, is_kept int)`` for EVERY input doc
    (docs outside any pair are their own singleton cluster, kept).

    100-TB shape: the pair graph is tiny relative to the corpus (only
    verified near-dups), so the component supersteps run on
    pair-vertices only; the final assignment is one broadcast-or-hash
    left join of the corpus against the label table.
    """
    from unarxive_spark.operators.components import connected_components

    edges = pairs.select(
        F.col("id_a").alias("src_conv_id"),
        F.col("id_b").alias("dst_conv_id"),
    )
    labels = connected_components(edges, shortcut=True).components.select(
        F.col("conv_id").alias(id_col),
        F.col("component").alias("_rep"),
    )
    rep = F.coalesce(F.col("_rep"), F.col(id_col))
    return (
        docs.select(id_col)
        .join(labels, id_col, "left")
        .select(
            id_col,
            rep.alias("cluster_rep"),
            (rep == F.col(id_col)).cast("int").alias("is_kept"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Directional near-dup: shingle CONTAINMENT C(A→B) = |A∩B| / |A|.

    ``max_df`` (default None = exact) drops shingles occurring in more
    than ``max_df`` documents before the posting-list join — the
    hot-shingle skew cap of :func:`ngram_jaccard_pairs`, with the same
    documented recall tradeoff (containment is then over the df-capped
    shingle sets).

    Symmetric Jaccard misses the subset case a dedup pipeline cares
    about most — a short document embedded verbatim inside a much longer
    one scores J = |A|/|B| ≈ 0 but C(A→B) = 1.  Emits every pair whose
    LARGER containment (i.e. shared / min(|A|, |B|)) reaches the
    threshold, with both directions reported.

    Same scale shape as the Jaccard join (inverted index on the 8-byte
    shingle hash, quadratic only within posting lists); deliberately NO
    length-ratio prune — asymmetric sizes are exactly the signal here,
    so the only lossless prune is sharing ≥ 1 shingle.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, k=k)).alias("_s"),
        )
        .select("id", h64(F.col("_s")).alias("shingle"))
        .distinct()
    )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= int(max_df))
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        sh.alias("l")
        .join(
            sh.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    c_ab = F.col("n_shared") / F.col("na")
    c_ba = F.col("n_shared") / F.col("nb")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.greatest(c_ab, c_ba) >= F.lit(threshold))
        .select(
            "id_a",
            "id_b",
            c_ab.alias("cont_a_in_b"),
            c_ba.alias("cont_b_in_a"),
        )
    )


# ---------- sorted-neighborhood ----------


def sorted_neighborhood_pairs(
    df: DataFrame,
    window: int = 5,
    key_tokens: int = 4,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood method (Hernández & Stolfo 1995): sort by a
    blocking key (the first ``key_tokens`` tokens), slide a ``window``
    of consecutive records, verify candidate pairs by exact token-set
    Jaccard → ``(a, b, rank_dist, n_common, jac)``.

    The classic complement to hash blocking (LSH bands, simhash
    blocks): hash blocking needs key EQUALITY, the sorted window also
    catches records whose keys are merely CLOSE in sort order.  Recall
    is bounded by the window by design — >``window`` records sharing a
    key region can miss pairs (run multiple passes with different keys
    for the standard multi-pass variant).

    Scale shape: the global sort rank is de-skewed exactly like the
    suffix-array construction (range-repartition + per-partition
    row_number + broadcast partition offsets, no single-task window);
    candidate generation is an EQUI-join on ``rank + offset`` with
    ``offset ∈ [1, window-1]`` exploded row-locally — never an
    inequality/range join, never all-pairs.  Verification carries the
    two distinct-token arrays through one join each and intersects
    row-locally."""
    from unarxive_spark.operators.suffixarray import _global_dense_ranks

    toks = tokens(F.lower(F.col(text_col)))
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            "id",
            F.array_join(
                F.slice("_toks", 1, int(key_tokens)), " "
            ).alias("_key"),
            F.array_sort(F.array_distinct("_toks")).alias("_set"),
        )
        .withColumn("_nd", F.size("_set").cast("long"))
    )
    ranked = _global_dense_ranks(
        base.select("id", "_key"), ["_key", "id"], "_r"
    ).select("id", "_r")
    r = base.join(ranked, "id")
    offs = r.select(
        "id",
        "_set",
        "_nd",
        "_r",
        F.explode(
            F.sequence(F.lit(1), F.lit(int(window) - 1))
        ).alias("_off"),
    ).select(
        F.col("id").alias("a"),
        F.col("_set").alias("_sa"),
        F.col("_nd").alias("_na"),
        (F.col("_r") + F.col("_off")).alias("_r2"),
        F.col("_off").alias("rank_dist"),
    )
    right = r.select(
        F.col("id").alias("b"),
        F.col("_set").alias("_sb"),
        F.col("_nd").alias("_nb"),
        F.col("_r").alias("_r2"),
    )
    inter = F.size(F.array_intersect("_sa", "_sb")).cast("long")
    return (
        offs.join(right, "_r2")
        .withColumn("n_common", inter)
        .withColumn(
            "jac",
            F.col("n_common")
            / (F.col("_na") + F.col("_nb") - F.col("n_common")),
        )
        .filter(F.col("jac") >= F.lit(float(threshold)))
        .select(
            "a",
            "b",
            F.col("rank_dist").cast("long").alias("rank_dist"),
            "n_common",
            F.round("jac", 6).alias("jac"),
        )
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_e6: int = 200_000,
    max_df: int | None = None,
) -> DataFrame:
    """Weighted (multiset) Jaccard near-dup pairs over word k-shingle
    FREQUENCIES: ``WJ = Σ min(tfA, tfB) / Σ max(tfA, tfB)`` — the
    repetition-aware refinement of :func:`ngram_jaccard_pairs` (a doc
    that repeats one paragraph 10× is near-identical to the single
    paragraph under set Jaccard but not under weighted Jaccard).

    Same inverted-index shape as the set variant, with two exactness
    upgrades: ``Σ max = totA + totB − Σ min`` (so only the min-sum is
    aggregated), and the threshold is applied as the exact integer
    cross-multiplication ``1e6·Σmin ≥ t_e6·(totA + totB − Σmin)`` — no
    float compare anywhere.  The length filter is the weighted analog
    (WJ ≤ min(tot)/max(tot), lossless).  → ``(id_a, id_b, w_shared,
    w_union, wjaccard)`` with wjaccard rounded to 6.

    ``max_df`` (default None = exact) is the hot-shingle skew cap the
    r5 verdict asked for: shingles occurring in more than ``max_df``
    documents are dropped BEFORE the posting-list join, so the score is
    the exact weighted Jaccard of the df-capped multisets (recall
    tradeoff as in :func:`ngram_jaccard_pairs`, pinned by a fixture).
    """
    from unarxive_spark.functions.texttools import shingles_multi

    t_e6 = int(threshold_e6)
    # same fan-out as ngram_jaccard_pairs: a few-MB parquet input is one
    # split, and the shingle explode's map side would run on one core
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles_multi(text_col, k=k)).alias("shingle"),
        )
        .groupBy("id", "shingle")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= int(max_df))
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    tot = sh.groupBy("id").agg(F.sum("tf").alias("tot"))
    l = sh.join(tot, "id").select(
        F.col("id").alias("id_a"),
        "shingle",
        F.col("tf").alias("tf_a"),
        F.col("tot").alias("tot_a"),
    )
    r = sh.join(tot, "id").select(
        F.col("id").alias("id_b"),
        F.col("shingle").alias("shingle_b"),
        F.col("tf").alias("tf_b"),
        F.col("tot").alias("tot_b"),
    )
    shared = (
        l.join(
            r,
            (F.col("shingle") == F.col("shingle_b"))
            & (F.col("id_a") < F.col("id_b"))
            # weighted length filter: WJ ≤ min(tot)/max(tot)
            & (F.lit(1_000_000) * F.col("tot_a") >= t_e6 * F.col("tot_b"))
            & (F.lit(1_000_000) * F.col("tot_b") >= t_e6 * F.col("tot_a")),
        )
        .groupBy("id_a", "id_b", "tot_a", "tot_b")
        .agg(F.sum(F.least("tf_a", "tf_b")).alias("w_shared"))
    )
    return (
        shared.select(
            "id_a",
            "id_b",
            "w_shared",
            (F.col("tot_a") + F.col("tot_b") - F.col("w_shared")).alias(
                "w_union"
            ),
        )
        .filter(
            F.lit(1_000_000) * F.col("w_shared")
            >= F.lit(t_e6) * F.col("w_union")
        )
        .select(
            "id_a",
            "id_b",
            "w_shared",
            "w_union",
            F.round(
                F.col("w_shared").cast("double") / F.col("w_union"), 6
            ).alias("wjaccard"),
        )
    )
