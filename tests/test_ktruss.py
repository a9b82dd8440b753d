"""k-truss vs a pure-Python peeling oracle."""

import itertools
import random

import pytest

from unarxive_spark.operators.ktruss import k_truss

SCHEMA = "src_conv_id string, dst_conv_id string"


def _oracle(edge_rows, k):
    live = {tuple(sorted(e)) for e in edge_rows if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in live:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dead = {
            (a, b)
            for a, b in live
            if len(adj[a] & adj[b]) < k - 2
        }
        if not dead:
            return live
        live -= dead


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.a, r.b) for r in k_truss(df, k).collect()}


def test_ktruss_clique_plus_tail(spark):
    # K5 (a 5-truss) with a pendant path: the path peels away for k>=3
    clique = [(f"k{i}", f"k{j}") for i, j in itertools.combinations(range(5), 2)]
    tail = [("k0", "t1"), ("t1", "t2"), ("t2", "t3")]
    rows = clique + tail
    for k in (3, 4, 5):
        assert _run(spark, rows, k) == _oracle(rows, k), k
    assert _run(spark, rows, 6) == set()  # K5 has no 6-truss


def test_ktruss_cascading_peel(spark):
    # two triangles sharing an edge: each edge has support >= 1, but the
    # 4-truss (support >= 2) keeps only the shared structure... which
    # then cascades to empty — exercises the iterative re-check
    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    assert _run(spark, rows, 3) == _oracle(rows, 3) == {
        ("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")
    }
    assert _run(spark, rows, 4) == _oracle(rows, 4) == set()


def test_ktruss_random_graph(spark):
    rng = random.Random(9)
    rows = list(
        {
            tuple(sorted((f"v{rng.randrange(30)}", f"v{rng.randrange(30)}")))
            for _ in range(160)
        }
    )
    rows = [(a, b) for a, b in rows if a != b]
    for k in (3, 4, 5):
        assert _run(spark, rows, k) == _oracle(rows, k), k


def test_ktruss_rejects_small_k(spark):
    df = spark.createDataFrame([("a", "b")], SCHEMA)
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(df, 2)
