"""k-source Brandes betweenness vs the textbook sequential algorithm."""

import hashlib
import random
from collections import deque

from unarxive_spark.operators.betweenness import betweenness

SCHEMA = "src_conv_id string, dst_conv_id string"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brandes(edge_rows, sources):
    adj = {}
    verts = set()
    for u, v in edge_rows:
        verts |= {u, v}
        if u != v:
            adj.setdefault(u, set()).add(v)
    bc = {v: 0.0 for v in verts}
    for s in sources:
        # forward BFS
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        # backward accumulation
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.conv_id: r.bc for r in betweenness(df, **kw).collect()}


def test_betweenness_directed_path_all_sources(spark):
    n = 7
    rows = [(f"v{i}", f"v{i+1}") for i in range(n)]
    srcs = [f"v{i}" for i in range(n + 1)]
    got = _run(spark, rows, sources=srcs)
    # interior vertex i sits on i*(n-i) directed (s,t) pairs
    for i in range(n + 1):
        assert abs(got[f"v{i}"] - i * (n - i)) < 1e-9, i


def test_betweenness_random_graphs_match_brandes(spark):
    for seed in (3, 5):
        rng = random.Random(seed)
        rows = list(
            {
                (f"n{rng.randrange(25)}", f"n{rng.randrange(25)}")
                for _ in range(80)
            }
        )
        rows = [(u, v) for u, v in rows if u != v]
        verts = sorted({x for e in rows for x in e})
        srcs = verts[: len(verts) // 2]
        got = _run(spark, rows, sources=srcs)
        want = _brandes(rows, srcs)
        assert got.keys() == want.keys()
        for v in want:
            assert abs(got[v] - want[v]) < 1e-9, (seed, v)


def test_betweenness_default_sources_deterministic(spark):
    rows = [(f"a{i}", f"a{(i * 3 + 1) % 10}") for i in range(10)]
    rows = [(u, v) for u, v in rows if u != v]
    got = _run(spark, rows, k_sources=4)
    # replay the h64 top-k source pick + Brandes
    verts = sorted(
        {x for e in rows for x in e}, key=lambda x: (_h64(x), x)
    )
    want = _brandes(rows, verts[:4])
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
