"""Similarity search over embedding columns (task brief):
brute-force cosine top-k baseline + random-hyperplane-LSH bucketed ANN
as the scale path.

Vector math stays columnar: ``zip_with`` + ``aggregate`` HOFs compile to
JVM codegen — no Python, no UDF, for the dot products. The LSH sketch is
built from the portable md5 hash so bucketing is deterministic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(v):
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the (small) query set against
    the corpus, window-rank per query.

    Scale shape: corpus-side scan is embarrassingly parallel; the only
    shuffle is the per-query top-k (rank over |queries|·k candidates
    after per-partition pre-ranking by Catalyst's WindowExec... for large
    corpora switch to groupBy(query).agg(min_by-topk) — here the window
    keeps ties deterministic).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
            _norm(F.col(query_vec_col)).alias("qnorm"),
        )
    )
    c = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("norm"),
    ).filter(F.col("norm") > 0)
    scored = c.crossJoin(q).select(
        "query_id",
        "id",
        (_dot(F.col("vec"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sketch(
    vec_col, n_planes: int = 16, dim: int = 64, seed: int = 42
):
    """Random-hyperplane sign sketch as an int bucket id.

    Hyperplane h_p[j] = ±1 derived from md5(seed|p|j) — deterministic,
    data-independent, reproducible across runs/engines. bucket bit p =
    sign(Σ_j h_p[j]·v[j]).
    """
    bits = []
    for p in range(n_planes):
        # ±1 pattern for plane p — literal array baked into the plan
        signs = [
            1.0
            if int(
                hashlib.md5(f"{seed}|{p}|{j}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 0
            else -1.0
            for j in range(dim)
        ]
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x.cast("double") * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
        )
    return sum(bits[1:], bits[0])


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) index: deterministic k-means-lite.

    Centroids initialize from the ``n_centroids`` lowest-id vectors
    (deterministic — no sampling), refine with ``lloyd_iters`` Lloyd
    steps, then every vector is assigned to its nearest centroid. All
    DataFrame ops: assignment is a broadcast cross join + argmin window;
    the update step is a groupBy mean per dimension via posexplode.

    Returns (assignments(id, vec, norm, centroid_id), centroids DF).
    At scale the assignment table is written partitioned by
    ``centroid_id`` — queries probe only the nearest lists (partition
    pruning instead of a full scan).
    """
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("norm"),
    ).filter(F.col("norm") > 0)

    centroids = (
        v.orderBy("id")
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy("id"))
            .alias("centroid_id"),
            F.col("vec").alias("cvec"),
        )
    )

    def assign(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        scored = vectors.crossJoin(F.broadcast(cents)).select(
            "id",
            "vec",
            "norm",
            "centroid_id",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("norm") * _norm(F.col("cvec")))
            ).alias("sim"),
        )
        w = Window.partitionBy("id").orderBy(
            F.desc("sim"), F.asc("centroid_id")
        )
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn", "sim")
        )

    for _ in range(lloyd_iters):
        assigned = assign(v, centroids)
        # mean per (centroid, dimension): posexplode → groupBy → rebuild
        centroids = (
            assigned.select(
                "centroid_id", F.posexplode("vec").alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "centroid_id",
                F.transform("pm", lambda s: s["m"].cast("float")).alias(
                    "cvec"
                ),
            )
        )

    return assign(v, centroids), centroids


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    lloyd_iters: int = 2,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``n_probe`` nearest centroid
    lists per query, exact cosine re-rank inside the probed lists.

    ``lloyd_iters=0`` keeps the deterministic lowest-id init as the
    centroids (no float averaging) — the cross-engine-reproducible
    configuration the driver oracle (q54) checks bit-for-bit."""
    assigned, centroids = ivf_index(
        emb, n_centroids, dim, id_col, vec_col, lloyd_iters=lloyd_iters
    )
    probes = _query_probes(
        queries, centroids, n_probe, query_id_col, query_vec_col
    )
    cands = assigned.join(F.broadcast(probes), "centroid_id")
    scored = cands.select(
        "query_id",
        "id",
        (_dot(F.col("vec"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _probe_masks(n_planes: int, radius: int) -> list[int]:
    """All XOR masks with popcount ≤ radius: Σ_{i≤r} C(n_planes, i) keys.
    Applying each mask to a query's bucket enumerates exactly the buckets
    within hamming distance ``radius`` — the multi-probe key set."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for combo in combinations(range(n_planes), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def _query_probes(
    queries: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Per query: the ``n_probe`` nearest centroid ids (+ carried query
    vector/norm) — the probe list both IVF variants share."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        _norm(F.col(query_vec_col)).alias("qnorm"),
    )
    q_cent = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "qv",
        "qnorm",
        "centroid_id",
        (
            _dot(F.col("qv"), F.col("cvec"))
            / (F.col("qnorm") * _norm(F.col("cvec")))
        ).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("centroid_id")
    )
    return (
        q_cent.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "qv", "qnorm", "centroid_id")
    )


def ivf_write(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF index and persist the inverted lists PARTITIONED BY
    ``centroid_id`` — the 100-TB layout: each list is its own partition
    directory, so a probe reads only the probed lists (real partition
    pruning at the scan, asserted in tests/test_plan_shapes.py).
    Returns the centroid table (small; persist alongside on a cluster).
    """
    assigned, centroids = ivf_index(emb, n_centroids, dim, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        path
    )
    return centroids


def ivf_probe_topk(
    spark,
    path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe a persisted IVF index: nearest ``n_probe`` lists per query,
    scan ONLY those partitions (static partition filter from the tiny
    probe list — metadata-sized collect), exact cosine re-rank inside.
    """
    probes = _query_probes(
        queries, centroids, n_probe, query_id_col, query_vec_col
    ).cache()
    probe_ids = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    corpus = spark.read.parquet(path).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    cands = corpus.join(F.broadcast(probes), "centroid_id")
    scored = cands.select(
        "query_id",
        "id",
        (_dot(F.col("vec"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _global_rank(df: DataFrame, id_col: str, key) -> DataFrame:
    """Dense 1-based global rank in the deterministic total order
    ``(key, h64(id), id)`` — the de-skewed two-stage form (within-key
    window + broadcast per-key offsets, the pack_sequences/walks
    pattern): no single-task global sort.  ``key`` must have bounded
    cardinality (shard id, LSH bucket) so the offset table broadcasts;
    per-task work is bounded by the largest key group."""
    base = df.withColumn(
        "_h", h64(F.col(id_col).cast("string"))
    ).withColumn("_key", key)
    base = base.localCheckpoint(eager=False)
    w_in = Window.partitionBy("_key").orderBy("_h", id_col)
    local = base.withColumn("_lrk", F.row_number().over(w_in))
    sizes = base.groupBy("_key").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.partitionBy()
        .orderBy("_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_key",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offs), "_key")
        .withColumn("grank", (F.col("_off") + F.col("_lrk")).cast("long"))
        .drop("_h", "_key", "_lrk", "_off")
    )


def nn_descent(
    emb: DataFrame,
    k: int = 5,
    rounds: int = 2,
    init_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int = 16,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Graph-based ANN: NN-Descent (Dong, Moses & Li, WWW 2011) as
    join/agg supersteps — the scale path HNSW occupies in single-node
    libraries, re-expressed for Spark (an HNSW insertion order is
    inherently sequential; NN-Descent converges to the same kNN graph
    by iterating "my neighbors' neighbors are probably my neighbors",
    which is exactly a self-join).

    → final kNN graph ``(src_id, dst_id, cosine, rank)``: for every
    vector the ``k`` most cosine-similar vectors found after
    ``rounds`` refinement rounds.

    Determinism (the driver oracle replays every round bit-for-bit —
    both derandomizations go through the portable hash, no RNG):

    - init: each vector's ``init_k`` circular successors in the
      LSH-LOCALITY order ``(hyperplane bucket, h64(id), id)`` — near
      vectors tend to share buckets, so the init graph starts warm
      (the LSH-seeded init production NN-Descent variants use);
    - each round ``r``: undirect the graph, self-join it
      (neighbors-of-neighbors), ADD ``k`` exploration successors at
      round-shifted offsets ``r·k+1 … r·k+k`` in the hash order
      ``(h64 % n_shards, h64, id)`` (the derandomized form of
      NN-Descent's ρ-sampling — without it the refinement stalls once
      neighborhoods become pure), score only not-yet-kept pairs, keep
      the top ``k`` per vector by ``(cosine desc, dst asc)``.

    Scale shape: per-vector candidate count is bounded by
    ``2k + (2k)^2``, so the per-round window is bounded per key — no
    skew, no cartesian; scoring joins are equi-joins on vector id;
    both global ranks are the de-skewed two-stage form.  State is
    localCheckpointed per round (superstep discipline)."""
    if init_k is None:
        init_k = k
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("norm"),
    ).filter(F.col("norm") > 0)
    brank = _global_rank(
        v, "id", hyperplane_sketch(F.col("vec"), n_planes, dim, seed)
    ).localCheckpoint(eager=False)
    hrank = _global_rank(
        v.select("id"),
        "id",
        F.pmod(h64(F.col("id").cast("string")), F.lit(int(n_shards))),
    ).localCheckpoint(eager=False)
    n_total = F.broadcast(
        hrank.agg(F.count(F.lit(1)).cast("long").alias("_nt"))
    )

    def successors(ranked: DataFrame, lo: int, hi: int) -> DataFrame:
        """(src, dst) pairs: each id's circular successors at offsets
        ``lo..hi`` in the given rank order."""
        succ = (
            ranked.select("id", "grank")
            .crossJoin(n_total)
            .select(
                "id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(int(lo)), F.lit(int(hi))),
                        lambda j: F.pmod(
                            F.col("grank") - 1 + j.cast("long"),
                            F.col("_nt"),
                        )
                        + 1,
                    )
                ).alias("_ng"),
            )
        )
        return (
            succ.join(
                ranked.select(
                    F.col("grank").alias("_ng"), F.col("id").alias("dst")
                ),
                "_ng",
            )
            .select(F.col("id").alias("src"), "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    pairs0 = successors(brank, 1, init_k)

    def score(pairs: DataFrame) -> DataFrame:
        lhs = v.select(
            F.col("id").alias("src"),
            F.col("vec").alias("_sv"),
            F.col("norm").alias("_sn"),
        )
        rhs = v.select(
            F.col("id").alias("dst"),
            F.col("vec").alias("_dv"),
            F.col("norm").alias("_dn"),
        )
        return (
            pairs.join(lhs, "src")
            .join(rhs, "dst")
            .select(
                "src",
                "dst",
                (
                    _dot(F.col("_sv"), F.col("_dv"))
                    / (F.col("_sn") * F.col("_dn"))
                ).alias("cosine"),
            )
        )

    w_top = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    graph = (
        score(pairs0)
        .withColumn("_rk", F.row_number().over(w_top))
        .filter(F.col("_rk") <= int(k))
        .drop("_rk")
        .localCheckpoint(eager=True)
    )
    for r in range(1, int(rounds) + 1):
        und = (
            graph.select("src", "dst")
            .unionByName(
                graph.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .distinct()
        )
        nn = (
            und.alias("a")
            .join(und.alias("b"), F.col("a.dst") == F.col("b.src"))
            .select(
                F.col("a.src").alias("src"), F.col("b.dst").alias("dst")
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        explore = successors(hrank, r * int(k) + 1, (r + 1) * int(k))
        cands = nn.unionByName(explore).distinct()
        fresh = cands.join(
            graph.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        graph = (
            graph.unionByName(score(fresh))
            .withColumn("_rk", F.row_number().over(w_top))
            .filter(F.col("_rk") <= int(k))
            .drop("_rk")
            .localCheckpoint(eager=True)
        )
    return graph.select(
        F.col("src").alias("src_id"),
        F.col("dst").alias("dst_id"),
        "cosine",
        F.row_number().over(w_top).alias("rank"),
    )


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k via multi-probe hyperplane LSH: each query is
    EXPLODED into its ≤ Σ C(n_planes, i) probe-bucket keys (all buckets
    within ``probe_hamming`` bits), then **equi-joined** on ``bucket``
    with the sketched corpus, exact cosine re-rank inside. The candidate
    set is identical to the hamming-ball predicate, but the plan is a
    hash join on the bucket key — not a BroadcastNestedLoopJoin scanning
    every corpus row per query (asserted in tests/test_plan_shapes.py).

    At 100 TB the corpus-side sketch is computed once and written
    partitioned/bucketed by ``bucket``; the equi-join keys then prune to
    only the probed buckets instead of a full scan.
    """
    c = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("norm"),
        hyperplane_sketch(F.col(vec_col), n_planes, dim).alias("bucket"),
    ).filter(F.col("norm") > 0)
    masks = _probe_masks(n_planes, probe_hamming)
    probes = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("qv"),
            _norm(F.col(query_vec_col)).alias("qnorm"),
            hyperplane_sketch(F.col(query_vec_col), n_planes, dim).alias(
                "qbucket"
            ),
        ).select(
            "query_id",
            "qv",
            "qnorm",
            "qbucket",
            F.explode(
                F.array(*[F.lit(m).cast("long") for m in masks])
            ).alias("_mask"),
        ).select(
            "query_id",
            "qv",
            "qnorm",
            F.col("qbucket").bitwiseXOR(F.col("_mask")).alias("bucket"),
        )
    )
    cands = c.join(probes, "bucket")
    scored = cands.select(
        "query_id",
        "id",
        (_dot(F.col("vec"), F.col("qv")) / (F.col("norm") * F.col("qnorm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
