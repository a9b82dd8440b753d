"""ML sample preparation + stratified split.

Reference analogs:
- sample prep: /root/reference/src/utility_scripts/ml_tasks_prep_data.py
  (length filter :274-276, marker surface replacement :111-141, citation
  renumbering with offsets :143-184)
- stratified split: /root/reference/src/utility_scripts/ml_tasks_split_data.py
  (label-frequency threshold :78-93, proportional minima :155-171,
  seeded shuffle :98-99)

Spark-first: the reference's ``random.seed(42); random.shuffle`` becomes
a **content-hash bucket assignment** — deterministic, order-independent,
and cluster-stable (no global shuffle of 10^12 rows just to split them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64
from unarxive_spark.functions.refs import (
    renumber_citations,
    splice_markers,
)


def prep_samples(
    transcripts: DataFrame, min_chars: int = 40
) -> DataFrame:
    """Per-turn training samples: renumber conv refs to ``[1]..[n]``
    markers (first-appearance order), keep offsets verifiable, label by
    role. Length predicate analog of `len(text) < 200` drop."""
    t = transcripts.filter(F.length("text") >= min_chars)
    ordered = t.withColumn("ref_order", renumber_citations("text"))
    # map ref_id -> "[k]" per row (k = 1-based first-appearance index),
    # then splice; the (element, index) transform keeps lengths aligned
    # even for zero-ref rows
    repl = F.map_from_arrays(
        "ref_order",
        F.transform(
            "ref_order",
            lambda _, i: F.concat(
                F.lit("["), (i + 1).cast("string"), F.lit("]")
            ),
        ),
    )
    spliced = ordered.withColumn(
        "sample_text",
        F.when(F.size("ref_order") == 0, F.col("text")).otherwise(
            splice_markers("text", repl)
        ),
    )
    return spliced.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
            "_id"
        ),
        F.col("sample_text").alias("text"),
        F.col("role").alias("label"),
        F.size("ref_order").alias("n_distinct_refs"),
        "conv_id",
    )


def label_counts(samples: DataFrame, min_count: int = 3) -> DataFrame:
    """Labels with enough distinct conversations (A8 analog: per-label
    doc counts, threshold ≥ 3)."""
    return (
        samples.groupBy("label")
        .agg(F.countDistinct("conv_id").alias("n_convs"))
        .filter(F.col("n_convs") >= min_count)
    )


def stratified_split(
    samples: DataFrame,
    train: float = 0.8,
    dev: float = 0.1,
    seed: int = 42,
    strata_col: str = "label",
) -> DataFrame:
    """Deterministic per-stratum split via content-hash bucketing.

    Each row lands in train/dev/test by ``h64(seed || _id) % 10000``
    against per-stratum thresholds — proportions hold *within every
    label* (the reference's per-label proportional minima), and the
    assignment is reproducible at any parallelism.
    """
    bucket = h64(
        F.concat_ws("|", F.lit(str(seed)), F.col("_id"))
    ) % 10000
    t1 = int(train * 10000)
    t2 = int((train + dev) * 10000)
    return samples.withColumn(
        "split",
        F.when(bucket < t1, F.lit("train"))
        .when(bucket < t2, F.lit("dev"))
        .otherwise(F.lit("test")),
    )


def stratified_split_minima(
    samples: DataFrame,
    strata_cols: tuple[str, ...] = ("label",),
    train: float = 0.8,
    dev: float = 0.1,
    seed: int = 42,
    id_col: str = "_id",
) -> DataFrame:
    """Proportional-minima stratified split — the reference's exact
    allocation semantics (ml_tasks_split_data.py:155-171): each stratum
    (any combination of ``strata_cols``, e.g. (month, category, label))
    contributes EXACTLY ``ceil(N·dev)`` rows to dev and ``ceil(N·test)``
    to test (so every stratum, however rare, is represented in the held
    out splits), remainder to train.

    The reference's ``random.seed(42); shuffle`` becomes a row_number
    over the portable content hash within each stratum — deterministic,
    order- and partitioning-independent, no global shuffle beyond the
    one the window needs.
    """
    test = 1.0 - train - dev
    order_key = h64(F.concat_ws("|", F.lit(str(seed)), F.col(id_col)))
    w = Window.partitionBy(*strata_cols).orderBy(order_key, F.col(id_col))
    cnt_w = Window.partitionBy(*strata_cols)
    ranked = samples.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(cnt_w)
    )
    n_dev = F.ceil(F.col("_n") * F.lit(dev))
    n_test = F.ceil(F.col("_n") * F.lit(test))
    return ranked.withColumn(
        "split",
        F.when(F.col("_rk") <= n_dev, F.lit("dev"))
        .when(F.col("_rk") <= n_dev + n_test, F.lit("test"))
        .otherwise(F.lit("train")),
    ).drop("_rk", "_n")


def split_distribution(split_df: DataFrame) -> DataFrame:
    """Per (label, split) sample counts + within-label share (A9 analog:
    distribution denominators)."""
    counts = split_df.groupBy("label", "split").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = split_df.groupBy("label").agg(F.count(F.lit(1)).alias("total"))
    return counts.join(totals, "label").select(
        "label",
        "split",
        "n",
        F.round(F.col("n") / F.col("total"), 4).alias("share"),
    )


def priority_sample(
    df,
    k: int,
    group_cols,
    key_col: str,
    n_shards: int = 16,
):
    """Deterministic per-group bottom-k sample (priority sampling on the
    portable h64): keep the ``k`` rows with the smallest
    ``(h64(key), key)`` per group — a uniform random sample that is a
    PURE FUNCTION of the data (reruns, resumes, and the DuckDB oracle
    reproduce it row-for-row; same discipline as the stratified split).

    Skew shape: a plain ``row_number() over (partition by group order by
    h64)`` sorts each group's ENTIRE membership in one task.  Two-stage
    instead (the walks-rank pattern): rank within (group, h64 % shards)
    — bounded per-task work — keep k per shard, then rank the ≤
    shards·k survivors per group.  Lossless: the global bottom-k is
    contained in the per-shard bottom-k union.
    """
    from pyspark.sql import Window

    from unarxive_spark.functions.hashing import h64

    g = list(group_cols)
    pri = h64(F.col(key_col).cast("string"))
    sharded = df.withColumn("_pri", pri).withColumn(
        "_sh", F.pmod(F.col("_pri"), F.lit(int(n_shards)))
    )
    w_sh = Window.partitionBy(*g, "_sh").orderBy("_pri", key_col)
    survivors = sharded.withColumn(
        "_rk", F.row_number().over(w_sh)
    ).filter(F.col("_rk") <= k)
    w_g = Window.partitionBy(*g).orderBy("_pri", key_col)
    return (
        survivors.withColumn("_grk", F.row_number().over(w_g))
        .filter(F.col("_grk") <= k)
        .drop("_pri", "_sh", "_rk", "_grk")
    )


def weighted_priority_sample(
    df,
    k: int,
    group_cols,
    key_col: str,
    weight_col: str,
    max_weight: int = 1024,
    n_shards: int = 16,
):
    """Deterministic per-group weighted bottom-k sample — exact
    Efraimidis-Spirakis weighted sampling WITHOUT replacement, with the
    float ``u^(1/w)`` key replaced by integer weight replication:

        priority(i) = min over j in [0, w_i) of h64(key_i # j)

    Each item conceptually enters w_i independent 60-bit draws; the
    globally smallest draw belongs to item i with probability
    w_i / Σw, and — conditioning on earlier picks being removed — the
    same holds recursively among the remaining items, which is exactly
    the E-S without-replacement scheme (Efraimidis & Spirakis, IPL
    2006).  All integer md5-derived arithmetic, so the DuckDB oracle
    reproduces the sample row-for-row (no cross-engine float pow).

    Weights must be integers in ``[1, max_weight]`` (raised in-plan
    otherwise).  The replication is ROW-LOCAL: an array of ≤max_weight
    hashes folded by array_min inside the row — no explode, no extra
    shuffle; the only shuffles are the same two-stage de-skewed rank as
    :func:`priority_sample`.  At 100 TB pick max_weight so the
    per-row array stays small (quantize big weights upstream).
    """
    from pyspark.sql import Window

    from unarxive_spark.functions.hashing import h64

    g = list(group_cols)
    w_raw = F.col(weight_col)
    w_long = w_raw.cast("long")
    ok = F.assert_true(
        (w_raw.cast("double") == w_long.cast("double"))
        & (w_long >= 1)
        & (w_long <= int(max_weight)),
        F.lit(
            "weighted_priority_sample: weights must be integers in "
            f"[1, {max_weight}]"
        ),
    )
    key_s = F.col(key_col).cast("string")
    pri = F.array_min(
        F.transform(
            F.sequence(F.lit(0), (w_long - 1).cast("int")),
            lambda j: h64(
                F.concat(key_s, F.lit("#"), j.cast("string"))
            ),
        )
    )
    sharded = (
        df.withColumn("_ok", ok)
        .withColumn("_pri", F.when(F.col("_ok").isNull(), pri))
        .drop("_ok")
        .withColumn(
            "_sh", F.pmod(F.col("_pri"), F.lit(int(n_shards)))
        )
    )
    w_sh = Window.partitionBy(*g, "_sh").orderBy("_pri", key_col)
    survivors = sharded.withColumn(
        "_rk", F.row_number().over(w_sh)
    ).filter(F.col("_rk") <= k)
    w_g = Window.partitionBy(*g).orderBy("_pri", key_col)
    return (
        survivors.withColumn("_grk", F.row_number().over(w_g))
        .filter(F.col("_grk") <= k)
        .drop("_pri", "_sh", "_rk", "_grk")
    )


def mixture_sample(
    df: DataFrame,
    weights_permille: dict[str, int],
    domain_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 32,
) -> DataFrame:
    """Domain-mixture sampling → ``(id, domain, n_copies long)`` — the
    data-mixture pass of LLM pretraining (Pile/DoReMi-style domain
    reweighting): a domain with weight w is repeated ⌊w⌋ times plus one
    extra copy for EXACTLY ⌈frac(w)·N_dom⌉ deterministically-chosen
    documents, so realized domain sizes hit the target allocation
    exactly (not in expectation).  Weights are integer per-mille
    (1500 = 1.5 epochs; 250 = keep a quarter; unlisted domains default
    to 1000 = one copy), so every threshold is exact integer
    arithmetic — no cross-engine float rounding.

    The extra-copy pick is the ``⌈frac·N⌉`` lowest documents per domain
    in the canonical order ``(shard, h64(id), id)`` with
    ``shard = h64(id) % n_shards`` — the same de-skewed two-level rank
    as :func:`pack_sequences`: a within-(domain, shard) window plus a
    broadcastable ≤|domains|·n_shards-row offset join, never a
    whole-domain single-task sort (at 100 TB one domain can be a fifth
    of the corpus)."""
    if any(
        int(w) < 0 or int(w) != w for w in weights_permille.values()
    ):
        raise ValueError("weights_permille must be non-negative ints")
    h = h64(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        h.alias("_h"),
    ).withColumn("_sh", F.pmod(F.col("_h"), F.lit(int(n_shards))))
    w_in = Window.partitionBy("domain", "_sh").orderBy("_h", "id")
    ranked = base.withColumn("_rk_in", F.row_number().over(w_in))
    sizes = base.groupBy("domain", "_sh").agg(
        F.count(F.lit(1)).alias("_n_sh")
    )
    w_off = (
        Window.partitionBy("domain")
        .orderBy("_sh")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "domain",
        "_sh",
        F.coalesce(F.sum("_n_sh").over(w_off), F.lit(0)).alias("_off"),
    )
    n_dom = sizes.groupBy("domain").agg(
        F.sum("_n_sh").cast("long").alias("_n_dom")
    )
    pm = F.coalesce(
        *(
            [
                F.element_at(
                    F.create_map(
                        *[
                            F.lit(x)
                            for kv in sorted(weights_permille.items())
                            for x in kv
                        ]
                    ),
                    F.col("domain"),
                )
            ]
            if weights_permille
            else []
        ),
        F.lit(1000),
    ).cast("long")
    rank = F.col("_off") + F.col("_rk_in")
    extra_n = F.floor(
        ((pm % 1000) * F.col("_n_dom") + 999) / F.lit(1000)
    )
    n_copies = F.floor(pm / 1000) + F.when(
        rank <= extra_n, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ranked.join(F.broadcast(offs), ["domain", "_sh"])
        .join(F.broadcast(n_dom), "domain")
        .select(
            F.col("id").alias(id_col),
            F.col("domain").alias(domain_col),
            n_copies.cast("long").alias("n_copies"),
        )
    )


def negative_edge_samples(
    edges: DataFrame,
    k: int = 2,
    n_buckets: int = 64,
    src_col: str = "src_conv_id",
    dst_col: str = "dst_conv_id",
) -> DataFrame:
    """Deterministic negative-edge sampling for link-prediction
    training sets → ``(src_conv_id, dst_conv_id, sample_idx)``: for
    every vertex ``u`` and ``j ∈ 1..k``, a pseudo-random candidate
    vertex that is NOT adjacent to ``u`` in either direction.

    Candidate pick is the two-level de-skewed uniform draw: vertices
    are hash-bucketed (``h64(v) % n_buckets``) and ranked WITHIN their
    bucket (window partitioned by bucket — parallel, never a global
    sort); the probe ``h64(u#j)`` selects ``(bucket, rank % size)``
    via a broadcast ≤n_buckets-row size table.  Self-picks and probes
    into empty buckets drop (deterministically, both engines).  At
    cluster scale raise ``n_buckets`` ≈ |V|/1e6 so per-bucket windows
    stay bounded.

    Near-uniform, not exactly uniform (vertices in small buckets are
    slightly favored) — the standard trade for a rank-free
    distributed draw; exactness of the SAMPLE SET is what matters for
    reproducible training data, and that is bit-stable across engines.
    """
    if k < 1 or n_buckets < 1:
        raise ValueError("k and n_buckets must be >= 1")
    verts = (
        edges.select(F.col(src_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("v")))
        .distinct()
        .withColumn("_h", h64(F.col("v")))
        .withColumn("_b", F.pmod(F.col("_h"), F.lit(int(n_buckets))))
    )
    w = Window.partitionBy("_b").orderBy("_h", "v")
    ranked = verts.select(
        "v", "_b", (F.row_number().over(w) - 1).cast("long").alias("_r")
    )
    sizes = F.broadcast(
        ranked.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    )
    probes = (
        edges.select(F.col(src_col).alias("u"))
        .unionByName(edges.select(F.col(dst_col).alias("u")))
        .distinct()
        .select(
            "u", F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("j")
        )
        .withColumn(
            "_ph",
            h64(F.concat(F.col("u"), F.lit("#neg"), F.col("j").cast("string"))),
        )
        .withColumn("_b", F.pmod(F.col("_ph"), F.lit(int(n_buckets))))
    )
    cand = (
        probes.join(sizes, "_b")
        .withColumn(
            # integer division: _ph is 60-bit, a double round-trip
            # would corrupt the low bits past 2^53
            "_r",
            F.pmod(F.expr(f"_ph DIV {int(n_buckets)}"), F.col("_n")),
        )
        .join(ranked, ["_b", "_r"])
        .filter(F.col("v") != F.col("u"))
        .select(
            F.col("u").alias(src_col),
            F.col("v").alias(dst_col),
            F.col("j").cast("long").alias("sample_idx"),
        )
    )
    und = (
        edges.select(F.col(src_col), F.col(dst_col))
        .unionByName(
            edges.select(
                F.col(dst_col).alias(src_col),
                F.col(src_col).alias(dst_col),
            )
        )
        .distinct()
    )
    return cand.join(und, [src_col, dst_col], "left_anti")


def link_prediction_auc(
    edges: DataFrame,
    k_negatives: int = 2,
    n_buckets: int = 64,
    max_degree: int | None = 100,
) -> DataFrame:
    """Exact Mann-Whitney AUC of Adamic-Adar scores: positives = the
    real undirected edges, negatives = the deterministic non-adjacent
    sample (:func:`negative_edge_samples`) — the standard link-
    prediction evaluation, computed WITHOUT a quadratic pos×neg join.

    AUC = P(score_pos > score_neg) + P(=)/2.  Both sides score through
    the same integer Adamic-Adar table (pairs absent from it score 0),
    then the rank statistic is assembled from the DISTINCT-SCORE table:
    per score s, ``neg_less(s)`` is a prefix sum over the (tiny)
    ordered distinct scores and ``2U = Σ_s cp(s)·(2·neg_less(s) +
    cn(s))`` — every term an exact int64, so the DuckDB oracle replays
    bit-for-bit.  Returns ONE row: ``n_pos, n_neg, u2 (= 2U), auc_e6``
    (half-up integer rounding of U/(n_pos·n_neg) at 1e6 scale).

    100-TB shape: the only data-sized shuffles are the AA wedge join
    (hub-capped) and two groupBys on score; the distinct-score table a
    window runs over is bounded by the score domain, not the data.
    The final scalar ``1e6·2U`` fits int64 up to n_pos·n_neg ≈ 9e12 —
    beyond that, split the multiply (documented, not silently wrong:
    the expression raises on overflow in both engines).
    """
    from unarxive_spark.operators.cocitation import adamic_adar

    aa = adamic_adar(edges, min_shared=1, max_degree=max_degree).select(
        "a", "b", F.col("aa_e9").alias("_s")
    )
    pos = (
        edges.filter(F.col("src_conv_id") != F.col("dst_conv_id"))
        .select(
            F.least("src_conv_id", "dst_conv_id").alias("a"),
            F.greatest("src_conv_id", "dst_conv_id").alias("b"),
        )
        .distinct()
    )
    neg = (
        negative_edge_samples(edges, k=k_negatives, n_buckets=n_buckets)
        .select(
            F.least("src_conv_id", "dst_conv_id").alias("a"),
            F.greatest("src_conv_id", "dst_conv_id").alias("b"),
        )
        .distinct()
    )
    zero = F.lit(0).cast("long")
    pos_s = pos.join(aa, ["a", "b"], "left").select(
        F.coalesce("_s", zero).alias("s")
    )
    neg_s = neg.join(aa, ["a", "b"], "left").select(
        F.coalesce("_s", zero).alias("s")
    )
    cp = pos_s.groupBy("s").agg(F.count(F.lit(1)).alias("cp"))
    cn = neg_s.groupBy("s").agg(F.count(F.lit(1)).alias("cn"))
    st = cp.join(cn, "s", "full").select(
        "s",
        F.coalesce("cp", zero).alias("cp"),
        F.coalesce("cn", zero).alias("cn"),
    )
    w = (
        Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = st.select(
        "cp",
        "cn",
        (F.sum("cn").over(w) - F.col("cn")).alias("neg_less"),
    )
    agg = ranked.agg(
        F.sum("cp").alias("n_pos"),
        F.sum("cn").alias("n_neg"),
        F.sum(
            F.col("cp") * (2 * F.col("neg_less") + F.col("cn"))
        ).alias("u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        F.expr(
            "(1000000 * u2 + n_pos * n_neg) div (2 * n_pos * n_neg)"
        ).alias("auc_e6"),
    )
