"""DeepWalk embeddings: planted communities must embed closer together
than across (the structural property skip-gram-over-walks exists for).
Training is float/parallel so there is no cross-engine oracle; every
upstream stage (walks, corpus, ANN) is driver-oracle-checked."""

import itertools
import math

from unarxive_spark.operators.embeddings import deepwalk_embeddings

SCHEMA = "src_conv_id string, dst_conv_id string, weight double"


def _clique(prefix, n):
    ids = [f"{prefix}{i}" for i in range(n)]
    return [(a, b, 1.0) for a, b in itertools.permutations(ids, 2)]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb) if na and nb else 0.0


def test_deepwalk_separates_planted_communities(spark):
    rows = _clique("a", 6) + _clique("b", 6) + [("a0", "b0", 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    vecs = {
        r["conv_id"]: list(r["embedding"])
        for r in deepwalk_embeddings(
            df, walk_length=8, walks_per_vertex=6, dim=16, seed=7
        ).collect()
    }
    assert len(vecs) == 12
    assert all(len(v) == 16 for v in vecs.values())
    a = [v for k, v in vecs.items() if k.startswith("a")]
    b = [v for k, v in vecs.items() if k.startswith("b")]
    intra = [
        _cos(x, y) for grp in (a, b) for x, y in itertools.combinations(grp, 2)
    ]
    cross = [_cos(x, y) for x in a for y in b]
    avg_intra = sum(intra) / len(intra)
    avg_cross = sum(cross) / len(cross)
    assert avg_intra > avg_cross + 0.1, (avg_intra, avg_cross)


def test_deepwalk_deterministic_for_fixed_seed(spark):
    rows = _clique("a", 5)
    df = spark.createDataFrame(rows, SCHEMA)
    v1 = {
        r["conv_id"]: list(r["embedding"])
        for r in deepwalk_embeddings(
            df, walk_length=4, walks_per_vertex=3, dim=8, seed=3
        ).collect()
    }
    v2 = {
        r["conv_id"]: list(r["embedding"])
        for r in deepwalk_embeddings(
            df, walk_length=4, walks_per_vertex=3, dim=8, seed=3
        ).collect()
    }
    assert v1 == v2


def test_embeddings_feed_ann_with_recall_floor(spark):
    """End-to-end q90 path: deepwalk embeddings → LSH ANN vs exact
    brute-force cosine. The multi-probe LSH must recover >= 70% of the
    true top-5 neighbor sets on the sf0.001 graph (measured 85% at
    probe_hamming=4; fixed seed keeps this deterministic)."""
    from pyspark.sql import functions as F

    from unarxive_spark.plans.driver_queries import (
        ANN_E2E_K,
        ANN_E2E_QUERIES,
        q_embeddings_ann,
    )

    res = q_embeddings_ann(spark, "/root/testdata/sf0.001").collect()
    assert len(res) == ANN_E2E_QUERIES
    total = sum(r["n_overlap"] for r in res)
    denom = sum(r["n_brute"] for r in res)
    assert denom == ANN_E2E_QUERIES * ANN_E2E_K
    assert total / denom >= 0.7, (total, denom)
