"""Deterministic Luby MIS vs the sequential greedy-in-priority-order
oracle (the parallel local-minima fixpoint equals the lexicographically
first MIS under a fixed total priority order)."""

import hashlib
import random

import pytest

from unarxive_spark.operators.mis import maximal_independent_set

SCHEMA = "src_conv_id string, dst_conv_id string"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _oracle(edge_rows, salt="mis|"):
    verts = {x for e in edge_rows for x in e}
    adj = {}
    for u, v in edge_rows:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    mis = set()
    for v in sorted(verts, key=lambda x: (_h64(salt + x), x)):
        if not (adj.get(v, set()) & mis):
            mis.add(v)
    return mis


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.conv_id for r in maximal_independent_set(df).collect()}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_mis_random_graphs(spark, seed):
    rng = random.Random(seed)
    rows = list(
        {
            (f"v{rng.randrange(40)}", f"v{rng.randrange(40)}")
            for _ in range(120)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    got = _run(spark, rows)
    assert got == _oracle(rows)
    # independence + maximality invariants, independently re-checked
    adj = {}
    for u, v in rows:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    assert all(not (adj[v] & got) for v in got)
    verts = {x for e in rows for x in e}
    assert all(v in got or (adj[v] & got) for v in verts)


def test_mis_path_and_star(spark):
    path = [(f"p{i}", f"p{i+1}") for i in range(10)]
    star = [("hub", f"s{i}") for i in range(15)]
    for rows in (path, star, path + star):
        assert _run(spark, rows) == _oracle(rows)


def test_greedy_coloring(spark):
    from unarxive_spark.operators.mis import greedy_coloring

    rng = random.Random(17)
    rows = list(
        {
            (f"v{rng.randrange(18)}", f"v{rng.randrange(18)}")
            for _ in range(45)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.conv_id: r.color for r in greedy_coloring(df).collect()}

    adj = {}
    for u, v in rows:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    verts = set(adj)
    # complete + proper
    assert set(got) == verts
    assert all(got[u] != got[v] for u, v in rows)
    # deterministic replay: layer c = greedy MIS of the uncolored
    # subgraph under the layer-salted priorities
    want = {}
    uncolored = set(verts)
    c = 0
    while uncolored:
        layer = set()
        for v in sorted(
            uncolored, key=lambda x: (_h64(f"mis{c}|" + x), x)
        ):
            if not ((adj[v] & uncolored) & layer):
                layer.add(v)
        for v in layer:
            want[v] = c
        uncolored -= layer
        c += 1
    assert got == want
