"""Weighted SSSP vs Dijkstra oracle; modularity vs dict arithmetic."""

import heapq
from collections import defaultdict

from unarxive_spark.operators.lpa import label_propagation
from unarxive_spark.operators.modularity import modularity
from unarxive_spark.operators.sssp import shortest_paths


def _rows(df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in df.collect()
    ]


def _dijkstra(rows, source):
    adj = defaultdict(dict)
    for s, d, w in rows:
        if s != d:
            adj[s][d] = min(adj[s].get(d, float("inf")), w)
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj[u].items():
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _modularity_oracle(rows, labels):
    w = defaultdict(float)
    for s, d, wt in rows:
        if s != d:
            w[(s, d)] += wt
            w[(d, s)] += wt
    two_m = sum(w.values())
    w_in = sum(
        wt for (u, v), wt in w.items() if labels[u] == labels[v]
    )
    deg = defaultdict(float)
    for (u, _), wt in w.items():
        deg[u] += wt
    comm = defaultdict(float)
    for u, d in deg.items():
        comm[labels[u]] += d
    sq = sum(d * d for d in comm.values())
    return w_in / two_m - sq / (two_m * two_m)


def test_sssp_matches_dijkstra(spark, edges_small):
    src = "c000003"
    got = {
        r["conv_id"]: r["distance"]
        for r in shortest_paths(edges_small, src).collect()
    }
    want = _dijkstra(_rows(edges_small), src)
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_sssp_chain(spark):
    e = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 3.0), ("a", "c", 10.0)],
        "src_conv_id string, dst_conv_id string, weight double",
    )
    got = {
        r["conv_id"]: r["distance"]
        for r in shortest_paths(e, "a").collect()
    }
    assert got == {"a": 0.0, "b": 2.0, "c": 5.0}  # relaxed via b


def test_modularity_matches_oracle(spark, edges_small):
    res = label_propagation(edges_small, n_iter=3)
    labels = {r["conv_id"]: r["label"] for r in res.labels.collect()}
    q = modularity(edges_small, res.labels)
    want = _modularity_oracle(_rows(edges_small), labels)
    assert abs(q - want) < 1e-9
    assert -0.5 <= q <= 1.0


def test_seeded_lpa_anchors_and_frontier(spark):
    """Anchors never move; labels flood outward one hop per superstep;
    unreached vertices stay NULL instead of inventing communities."""
    from unarxive_spark.operators.lpa import seeded_label_propagation

    # two chains from two anchors + one isolated pair
    rows = [("a", "b", 1.0), ("b", "c", 1.0),
            ("x", "y", 2.0), ("p", "q", 1.0)]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    seeds = spark.createDataFrame(
        [("a", "A"), ("x", "X")], "conv_id string, label string"
    )
    res = seeded_label_propagation(df, seeds, n_iter=6)
    got = {r["conv_id"]: r["label"] for r in res.labels.collect()}
    assert got == {
        "a": "A", "b": "A", "c": "A",
        "x": "X", "y": "X",
        "p": None, "q": None,
    }
    # tie case: vertex between two different anchors at equal weight
    rows2 = [("a", "m", 1.0), ("x", "m", 1.0)]
    df2 = spark.createDataFrame(
        rows2, "src_conv_id string, dst_conv_id string, weight double"
    )
    res2 = seeded_label_propagation(df2, seeds, n_iter=3)
    got2 = {r["conv_id"]: r["label"] for r in res2.labels.collect()}
    assert got2["m"] == "A"  # min-label tie-break
