"""Physical-plan discipline at scale (task brief: '.explain the plan and
iterate until it's the plan you'd want'):
- filters/pruning pushed to the parquet scan (PushedFilters/ReadSchema)
- dimension joins broadcast
- no row-at-a-time Python in hot paths (BatchEvalPython absent;
  only ArrowEvalPython where a pandas UDF is intentional)
- whole-stage codegen present
"""

from pyspark.sql import functions as F

from unarxive_spark.operators.edges import build_edges
from unarxive_spark.plans.driver_queries import transcripts_from_events
from unarxive_spark.plans.tabular_queries import (
    q_pricing_summary,
    q_revenue_by_nation,
)

SF = "/root/testdata/sf0.001"


import contextlib
import io


def _explain(df, mode) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _explain(df, "extended")


def _formatted(df) -> str:
    return _explain(df, "formatted")


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_quantity")
    plan = _formatted(q)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: scan schema is only the referenced columns
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "l_quantity" in read_schema and "l_extendedprice" not in read_schema


def test_edge_build_is_jvm_only_and_broadcasts(spark):
    t = transcripts_from_events(spark, SF)
    e = build_edges(t)
    plan = _plan(e)
    # zero Python in the edge-build hot path (regexp_extract_all is JVM)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "LeftSemi" in plan
    # no forced broadcast hint (vertex set is huge at target scale) —
    # AQE must still pick a broadcast for the small side AT RUNTIME:
    e.count()
    final = _formatted(e)
    assert "BroadcastHashJoin" in final or "BroadcastExchange" in final, final
    assert "WholeStageCodegen" in _explain(e, "codegen")


def test_dim_joins_broadcast(spark):
    plan = _plan(q_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2


def test_agg_has_partial_aggregation(spark):
    plan = _plan(q_pricing_summary(spark, SF))
    # map-side combine before the shuffle: two HashAggregate levels
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert "WholeStageCodegen" in _explain(q_pricing_summary(spark, SF), "codegen")


def test_pagerank_superstep_plan(spark):
    """The per-iteration join must not re-shuffle the cached edge side:
    edges are repartitioned('src') once; ranks (small) shuffle to meet
    them. Assert the salted gather introduces the two-stage aggregate."""
    from unarxive_spark.operators.skew import salted_sum

    t = transcripts_from_events(spark, SF)
    e = build_edges(t)
    g = salted_sum(
        e, key="dst_conv_id", value=F.sum("weight"), out="w",
        salt_from="src_conv_id", n_salts=8,
    )
    plan = _plan(g)
    assert plan.count("HashAggregate") >= 3  # partial+final × two stages


def test_ann_and_embedding_dedup_are_bucketed(spark):
    """The two formerly-quadratic plans: multi-probe LSH ANN and banded
    embedding dedup must be hash equi-joins on bucket keys — never a
    BroadcastNestedLoopJoin (per-query full corpus scan) or a
    CartesianProduct (all-pairs)."""
    from unarxive_spark.operators.dedup import embedding_dup_pairs
    from unarxive_spark.operators.similarity import lsh_ann_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann_plan = _plan(lsh_ann_topk(emb, queries, n_planes=8, probe_hamming=2))
    assert "BroadcastNestedLoopJoin" not in ann_plan
    assert "CartesianProduct" not in ann_plan

    dup_plan = _plan(embedding_dup_pairs(emb))
    assert "BroadcastNestedLoopJoin" not in dup_plan
    assert "CartesianProduct" not in dup_plan
    # the escape-hatch brute force is still quadratic, by design
    exact_plan = _plan(embedding_dup_pairs(emb, exact=True))
    assert (
        "BroadcastNestedLoopJoin" in exact_plan
        or "CartesianProduct" in exact_plan
    )


def test_round4_operator_plans_have_no_quadratic_joins(spark):
    """Round-4 additions must keep the candidate-by-key-equality
    discipline: no BroadcastNestedLoopJoin / CartesianProduct anywhere
    in the q-digest build, weighted/node2vec walk steps, Louvain round,
    containment join, dedup-cluster assignment, or priority sample."""
    from unarxive_spark.operators.dedup import (
        containment_pairs,
        dedup_clusters,
    )
    from unarxive_spark.operators.mltasks import priority_sample
    from unarxive_spark.operators.qdigest import qdigest

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")

    for df in (
        qdigest(ev, "value", ["event_type"], k=16, bits=8),
        containment_pairs(docs, threshold=0.8),
        priority_sample(docs.select("lang", "doc_id"), 5, ["lang"], "doc_id"),
    ):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = _plan(dedup_clusters(docs.select("doc_id"), pairs))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_qdigest_leaf_histogram_partially_aggregates(spark):
    """The only data-sized shuffle in the digest build is the leaf
    histogram — it must partial-aggregate map-side (partial_count before
    the exchange), so 100-TB input reduces to <= 2^bits rows per group
    before any shuffle."""
    from unarxive_spark.operators.qdigest import _quantize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    leaves = (
        ev.filter(F.col("value").isNotNull())
        .select("event_type", _quantize("value", 0.0, 1024.0, 12).alias("idx"))
        .groupBy("event_type", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = _formatted(leaves)
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_weighted_rank_windows_are_shard_keyed(spark):
    """The cumulative-weight prefix windows must be keyed by
    (src, shard), never src alone over the raw adjacency — a mega-hub's
    out-edges would otherwise prefix-sum in ONE task. (The walk-loop
    plans themselves can't be inspected post-hoc: eager per-step
    localCheckpoints replace them with checkpoint scans — this pins the
    shared un-checkpointed rank build both walk variants consume.)"""
    from unarxive_spark.operators.walks import _weighted_ranked_edges

    edges = spark.createDataFrame(
        [("hub", f"t{i:03d}", float(1 + i % 3)) for i in range(200)],
        "src_conv_id string, dst_conv_id string, weight double",
    )
    plan = _plan(_weighted_ranked_edges(edges, "weight"))
    win_lines = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert win_lines, "expected window nodes in the rank-build plan"
    # the per-edge prefix window carries the shard key; the only
    # src-alone windows run over the <= N_RANK_SHARDS shard-size rows
    per_edge = [ln for ln in win_lines if "_w#" in ln or "_w " in ln]
    assert per_edge
    assert all("_sh" in ln for ln in per_edge), per_edge[:2]


def test_round5_continuation_plans_have_no_quadratic_joins(spark):
    """q104-q110 additions keep the candidate-by-key-equality
    discipline: suffix-array construction/LCP lifting, dup-span
    coverage, Adamic-Adar wedges, Kneser-Ney counts, landmark BFS
    expansion, and sorted-neighborhood candidates are all hash
    equi-joins — no BroadcastNestedLoopJoin, no CartesianProduct
    (the 1-row scalar crossJoin in Kneser-Ney is a broadcast
    aggregate, same accepted pattern as HITS/modularity)."""
    from unarxive_spark.operators.bfs import landmark_closeness
    from unarxive_spark.operators.cocitation import adamic_adar
    from unarxive_spark.operators.corpus import kneser_ney_bigram
    from unarxive_spark.operators.dedup import sorted_neighborhood_pairs
    from unarxive_spark.operators.suffixarray import (
        duplicated_span_stats,
        repeated_span_histogram,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(40)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    edges = build_edges(transcripts_from_events(spark, SF))

    for df in (
        repeated_span_histogram(docs),
        duplicated_span_stats(docs, min_len=3),
        adamic_adar(edges, max_degree=50),
        sorted_neighborhood_pairs(docs, window=4),
        landmark_closeness(edges, n_landmarks=2, max_hops=2),
    ):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    kn = kneser_ney_bigram(docs)
    plan = _plan(kn)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the only nested-loop is the broadcast 1-row n_types scalar
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_round5_close_plans_have_no_quadratic_joins(spark):
    """q121-q129 additions keep the discipline: association-rule pairs
    join on the basket key, CUSUM/EWMA are pure windows, matching /
    influence / Borůvka supersteps are hash equi-joins, the AUC rank
    statistic joins on the score key. The only nested-loops are the
    accepted broadcast 1-row scalars (n_baskets, the sim dimension,
    the AUC denominators)."""
    from unarxive_spark.operators.boruvka import boruvka_forest
    from unarxive_spark.operators.influence import ic_influence_spread
    from unarxive_spark.operators.itemsets import association_rules
    from unarxive_spark.operators.matching import maximal_matching
    from unarxive_spark.operators.mltasks import link_prediction_auc
    from unarxive_spark.operators.timeseries import cusum_drift, ewma_smooth

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    edges = build_edges(transcripts_from_events(spark, SF))

    for df, nl_budget in (
        (association_rules(li, "l_orderkey", "l_partkey"), 1),
        (cusum_drift(ev), 0),
        (ewma_smooth(ev), 0),
        (maximal_matching(edges, fixed_rounds=1), 0),
        (ic_influence_spread(edges, n_sims=2, hops=1), 0),
        (link_prediction_auc(edges), 1),
        (boruvka_forest(edges, fixed_rounds=1), 0),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= nl_budget, plan


def test_triad_census_avoids_triple_enumeration(spark):
    """The census engine plan is wedge joins — no CartesianProduct,
    no nested-loop beyond the accepted broadcast 1-row scalars
    (vertex count, total), no Python."""
    from unarxive_spark.operators.triads import triad_census

    edges = build_edges(transcripts_from_events(spark, SF))
    # eager=False keeps the real dataflow visible (no localCheckpoint)
    plan = _plan(triad_census(edges, eager=False))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the only nested-loops are broadcast 1-ROW scalar assemblies
    # (scal × csum × n, nulls × total), some appearing twice in the
    # tree because the singles frame feeds both the total and the
    # final union — every build side is a single-row aggregate
    assert plan.count("BroadcastNestedLoopJoin") <= 6, plan
    assert "Exchange" in plan  # it is a real distributed dataflow


def test_corpus_no_forced_broadcast_of_unbounded_tables():
    """r5 verdict #3: vocabulary-sized tables (document frequencies,
    unigram counts, KN context/continuation tables) must not carry a
    forced broadcast hint — at corpus scale they are 1e8-1e9 rows and
    the hint turns a working shuffle join into a job failure. The
    remaining F.broadcast sites in corpus.py are all bounded by
    construction: 1-row scalar aggregates, the n_parts-row partition
    offset table, the n_buckets-row DSIR weight table, and the
    benchmark side of decontamination (small by definition)."""
    import inspect

    from unarxive_spark.operators import corpus

    src = inspect.getsource(corpus)
    for name in ("dfreq", "cu.select", "(left", "(prec"):
        for i in range(len(src)):
            if src.startswith("F.broadcast", i):
                window = src[i : i + 120]
                assert name not in window, (
                    f"unbounded table {name!r} inside a forced "
                    f"broadcast: {window!r}"
                )
