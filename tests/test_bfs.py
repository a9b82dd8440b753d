"""BFS distances vs a pure-Python BFS oracle on golden + Zipf graphs."""

from collections import deque

from unarxive_spark.datagen import golden_graphs
from unarxive_spark.operators.bfs import bfs_distances, k_hop_neighbors


def _oracle(rows, sources, max_hops):
    adj = {}
    for s, d, _ in rows:
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _rows(df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in df.collect()
    ]


def test_bfs_golden(spark):
    g = golden_graphs(spark)
    chain = g["chain"]  # 0→1→2→3
    got = {
        r["conv_id"]: r["distance"]
        for r in bfs_distances(chain, ["c000000"], max_hops=10).collect()
    }
    assert got == {
        "c000000": 0,
        "c000001": 1,
        "c000002": 2,
        "c000003": 3,
    }
    # directed: nothing reachable from the sink
    got_rev = {
        r["conv_id"]: r["distance"]
        for r in bfs_distances(chain, ["c000003"], max_hops=10).collect()
    }
    assert got_rev == {"c000003": 0}
    # two components: BFS stays inside one
    two = g["two_components"]
    got2 = {
        r["conv_id"]: r["distance"]
        for r in bfs_distances(two, ["c000002"], max_hops=10).collect()
    }
    assert set(got2) == {"c000002", "c000003", "c000004"}


def test_bfs_zipf_matches_oracle(edges_small):
    rows = _rows(edges_small)
    src = ["c000007"]
    got = {
        r["conv_id"]: r["distance"]
        for r in bfs_distances(edges_small, src, max_hops=6).collect()
    }
    assert got == _oracle(rows, src, 6)
    kh = {
        r["conv_id"]: r["distance"]
        for r in k_hop_neighbors(edges_small, src, 2).collect()
    }
    want = {
        k: v for k, v in _oracle(rows, src, 2).items() if v > 0
    }
    assert kh == want


def test_landmark_closeness_matches_oracle(edges_small):
    """Multi-source flood == per-landmark single-source BFS over the
    undirected graph; closeness = n_reached / total_dist."""
    from unarxive_spark.operators.bfs import (
        landmark_closeness,
        landmark_distances,
    )

    rows = _rows(edges_small)
    und = {}
    for s, d, _ in rows:
        if s != d:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
    urows = [(u, v, 1.0) for u, vs in und.items() for v in vs]

    got = {
        (r["landmark"], r["conv_id"]): r["distance"]
        for r in landmark_distances(
            edges_small, n_landmarks=4, max_hops=6
        ).collect()
    }
    landmarks = {l for l, _ in got}
    assert len(landmarks) == 4
    want = {}
    for l in landmarks:
        for v, dd in _oracle(urows, [l], 6).items():
            want[(l, v)] = dd
    assert got == want

    cl = {
        r["conv_id"]: (r["n_reached"], r["total_dist"], r["closeness"])
        for r in landmark_closeness(
            edges_small, n_landmarks=4, max_hops=6
        ).collect()
    }
    agg = {}
    for (l, v), dd in want.items():
        n, s = agg.get(v, (0, 0))
        agg[v] = (n + 1, s + dd)
    for v, (n, s) in agg.items():
        assert cl[v][:2] == (n, s)
        assert cl[v][2] == (round(n / s, 6) if s else 0.0)
    assert set(cl) == set(agg)
