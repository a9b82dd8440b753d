"""PageRank as DataFrame join/agg supersteps (no GraphX/GraphFrames).

Semantics (matched 1e-6 by the numpy oracle in tests/test_pagerank.py):
- damping d (default 0.85), uniform teleport (1-d)/N
- **weighted** transition: P(u→v) = weight(u,v) / Σ_w weight(u,w)
- **dangling mass**: rank of vertices with no out-edges is redistributed
  uniformly each superstep (Σ ranks stays 1 exactly)
- convergence on max|Δrank| < tol

Superstep dataflow (SURVEY.md §7 L3):
    ranks ⋈ edges_norm ON src           (big-big: both sides
                                         hash-partitioned on the join key;
                                         AQE handles residual skew)
    → salted_sum over dst               (skew-bounded gather, map-side
                                         partial agg + bounded reduce keys)
    → left join onto vertices, fill 0   (vertices w/o in-edges)
    → damping + dangling redistribution (scalar broadcast)
    → CheckpointManager.commit          (plan truncation + resume lineage)

The edge table is normalized and repartitioned by ``src_conv_id`` ONCE
and cached: per-iteration work reuses that layout, so only the small
ranks side shuffles each superstep (SURVEY.md §4.3).

Reference analog: the reference has no PageRank; this is the north-rule
analytics layer over its citation network (README.md:27-32), with
``calc_stats``-style per-iteration metrics logged to the lineage table
(/root/reference/src/match_references_openalex.py:637-661 precedent).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64
from unarxive_spark.operators.skew import salted_sum
from unarxive_spark.sources.checkpoint import CheckpointManager

RANK_SCHEMA = "conv_id string, rank double"


@dataclass
class PageRankResult:
    ranks: DataFrame
    iterations: int
    converged: bool
    deltas: list[float] = field(default_factory=list)
    # wall seconds per superstep (index 0 includes cache warm-up; scaling
    # metrics should use index >= 1)
    superstep_secs: list[float] = field(default_factory=list)


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src_conv_id").alias("conv_id"))
        .unionByName(edges.select(F.col("dst_conv_id").alias("conv_id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = True,
    checkpoint_dir: str | None = None,
    n_salts: int = 16,
    vertices: DataFrame | None = None,
    initial_ranks: DataFrame | None = None,
    personalization: list[str] | None = None,
    superstep_aqe: bool = True,
) -> PageRankResult:
    """Run PageRank to convergence. ``checkpoint_dir`` enables resumable
    per-iteration commits; a rerun with the same dir continues from the
    last committed superstep (state format is per-version: resume from a
    checkpoint written by an older build is not supported).

    ``initial_ranks`` (conv_id, rank) warm-starts the iteration — the
    incremental-recompute path (SURVEY.md §2.9: new data = re-run over
    the updated edge table): seeding with the previous converged scores
    converges in far fewer supersteps than a cold start. New vertices
    get the uniform prior; the vector is renormalized to Σ=1 so the
    fixpoint is unchanged.

    ``personalization``: conv_ids receiving the teleport mass (uniform
    over the set) — personalized PageRank ("conversations related to
    these"). Dangling mass teleports to the same set. None = classic
    uniform teleport.

    ``superstep_aqe=False`` disables adaptive execution INSIDE the
    superstep loop only (restored after): each superstep's plan is
    identical across iterations, so AQE's per-stage re-planning barrier
    is pure overhead here — at sandbox scale it is a measurable part of
    the ~2 s/superstep serial floor. Keep the default (on) when edge
    skew is unknown; the explicit salting already bounds the gather.

    The dangling-mass term costs NO extra join per superstep: the rank
    state carries a ``has_out`` flag (computed once from the edge table),
    so the mass is a filter + 1-row aggregate over the state itself,
    broadcast back into the plan.
    """
    spark = edges.sparkSession
    ckpt = CheckpointManager(spark, checkpoint_dir)

    if vertices is None:
        vertices = _vertices(edges)
    # vertex table with the dangling flag, co-partitioned with the
    # gather output and cached ONCE for the whole run
    src_ids = edges.select(F.col("src_conv_id").alias("conv_id")).distinct()
    vertices = (
        vertices.join(src_ids.withColumn("_ho", F.lit(1)), "conv_id", "left")
        .select(
            "conv_id", F.coalesce("_ho", F.lit(0)).alias("has_out")
        )
        .repartition("conv_id")
        .cache()
    )
    n = vertices.count()
    if n == 0:
        empty = spark.createDataFrame([], RANK_SCHEMA)
        return PageRankResult(empty, 0, True)

    w = F.col("weight") if weighted else F.lit(1.0)
    out_norm = edges.groupBy("src_conv_id").agg(F.sum(w).alias("out_w"))
    # transition probability per edge, fixed across iterations; the
    # gather salt is a pure function of src, so it is hashed ONCE here
    # instead of md5-ing every edge every superstep (identical groups →
    # bit-identical partial sums)
    edges_norm = (
        edges.join(out_norm, "src_conv_id")
        .select(
            F.col("src_conv_id").alias("src"),
            F.col("dst_conv_id").alias("dst"),
            (w / F.col("out_w")).alias("p"),
            F.pmod(h64(F.col("src_conv_id")), F.lit(n_salts)).alias(
                "_salt"
            ),
        )
        .repartition("src")
        .cache()
    )
    edges_norm.count()  # materialize the co-partitioned layout once
    # count danglers from the built vertex table itself: correct even
    # when a caller-supplied ``vertices`` frame omits some edge sources
    # (n - src_ids.count() would undercount and leak rank mass)
    n_dangling = vertices.filter(F.col("has_out") == 0).count()

    start_iter = 0
    resumed = ckpt.last_committed()
    if resumed is not None:
        ranks = ckpt.restore(resumed)
        start_iter = resumed + 1
    elif initial_ranks is not None:
        seeded = vertices.join(
            initial_ranks.select("conv_id", F.col("rank").alias("_r0")),
            "conv_id",
            "left",
        ).select(
            "conv_id",
            F.coalesce("_r0", F.lit(1.0 / n)).alias("rank"),
            "has_out",
        )
        total = seeded.agg(F.sum("rank")).collect()[0][0] or 1.0
        ranks = seeded.select(
            "conv_id",
            (F.col("rank") / F.lit(float(total))).alias("rank"),
            "has_out",
        ).localCheckpoint(eager=True)
    else:
        ranks = vertices.select(
            "conv_id", F.lit(1.0 / n).alias("rank"), "has_out"
        )

    deltas: list[float] = []
    superstep_secs: list[float] = []
    converged = False
    it = start_iter
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_before = spark.conf.get(aqe_key)
    if not superstep_aqe:
        spark.conf.set(aqe_key, "false")
    try:
        for it in range(start_iter, max_iter):
            t_iter = time.monotonic()
            contribs = edges_norm.join(
                ranks.select(
                    F.col("conv_id").alias("src"), "rank"
                ),
                "src",
            ).select(
                "dst", (F.col("p") * F.col("rank")).alias("c"), "_salt"
            )
            gathered = salted_sum(
                contribs, key="dst", value=F.sum("c"), out="g",
                salt_from="src", n_salts=n_salts, salt_col="_salt",
            )
            # Dangling mass: filter + 1-row aggregate over the CURRENT
            # state (the has_out flag rides in the state rows — no join),
            # broadcast back into the plan. NO per-iteration driver
            # round-trip.
            if n_dangling:
                dmass_df = ranks.filter(F.col("has_out") == 0).agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
                )
            else:
                dmass_df = spark.range(1).select(F.lit(0.0).alias("_dm"))
            if personalization:
                # teleport vector p(v): 1/|S| on the source set, else 0
                p_v = F.when(
                    F.col("conv_id").isin(*personalization),
                    F.lit(1.0 / len(personalization)),
                ).otherwise(F.lit(0.0))
            else:
                p_v = F.lit(1.0 / n)
            # The state rows ARE the vertex set (invariant from init),
            # so building the new state from the old one carries the
            # previous rank along for free — the convergence delta then
            # becomes a column diff over the materialized state instead
            # of a second vertex-table join per superstep (guide §2.4).
            new_ranks = (
                ranks.select(
                    "conv_id", F.col("rank").alias("_prev"), "has_out"
                )
                .join(
                    gathered.withColumnRenamed("dst", "conv_id"),
                    "conv_id",
                    "left",
                )
                .crossJoin(F.broadcast(dmass_df))
                .select(
                    "conv_id",
                    (
                        p_v
                        * (
                            F.lit(1.0 - damping)
                            + F.lit(damping) * F.col("_dm")
                        )
                        + F.lit(damping) * F.coalesce(F.col("g"), F.lit(0.0))
                    ).alias("rank"),
                    "has_out",
                    "_prev",
                )
            )
            # Materialize the superstep exactly once (plan truncation +
            # resumable state). Fixed-iteration mode (tol < 0) needs
            # NOTHING else — zero scalar actions per superstep;
            # convergence mode adds one delta aggregation over the cheap
            # re-scan.
            new_ranks_m = ckpt.write_state(it, new_ranks)
            if tol >= 0:
                delta = float(
                    new_ranks_m.agg(
                        F.max(F.abs(F.col("rank") - F.col("_prev")))
                    ).collect()[0][0]
                )
            else:
                delta = float("inf")
            deltas.append(delta)
            ckpt.log_lineage(it, new_ranks_m, "max_abs_delta", delta)
            ranks = new_ranks_m
            superstep_secs.append(time.monotonic() - t_iter)
            if delta < tol:
                converged = True
                break
    finally:
        if not superstep_aqe:
            spark.conf.set(aqe_key, aqe_before)

    return PageRankResult(
        ranks.select("conv_id", "rank"),
        it + 1,
        converged,
        deltas,
        superstep_secs,
    )
