"""Deterministic random walks vs a pure-Python replay of the same
hash-driven successor choice."""

import hashlib

from unarxive_spark.operators.walks import (
    N_RANK_SHARDS,
    _ranked_edges,
    random_walks,
    walk_corpus,
)

SCHEMA = "src_conv_id string, dst_conv_id string, weight double"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _walk_oracle(rows, starts, walk_length, walks_per_vertex, seed):
    adj = {}
    for u, v, _ in rows:
        adj.setdefault(u, set()).add(v)
    # engine's deterministic adjacency order: (h64(dst) % shards, dst)
    adj = {
        u: sorted(vs, key=lambda d: (_h64(d) % N_RANK_SHARDS, d))
        for u, vs in adj.items()
    }
    out = {}
    for s in starts:
        for i in range(walks_per_vertex):
            wid = f"{s}#{i}"
            path = [s]
            cur = s
            for step in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_h64(f"{seed}|{wid}|{step}") % len(nbrs)]
                path.append(cur)
            out[wid] = path
    return out


def test_walks_match_python_replay(spark, edges_small):
    rows = [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in edges_small.collect()
    ]
    starts_l = sorted({u for u, _, _ in rows})[:10]
    starts = spark.createDataFrame(
        [(s,) for s in starts_l], "conv_id string"
    )
    got_rows = random_walks(
        edges_small, starts, walk_length=4, walks_per_vertex=2, seed=7
    ).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["walk_id"], r["step"])):
        got.setdefault(r["walk_id"], []).append(r["conv_id"])
    want = _walk_oracle(rows, starts_l, 4, 2, 7)
    assert got == want
    # walks follow real edges only
    edge_set = {(u, v) for u, v, _ in rows}
    for path in got.values():
        for a, b in zip(path, path[1:]):
            assert (a, b) in edge_set
    # corpus sentences equal the ordered paths
    corpus = {
        r["walk_id"]: list(r["sentence"])
        for r in walk_corpus(
            random_walks(
                edges_small, starts, walk_length=4,
                walks_per_vertex=2, seed=7,
            )
        ).collect()
    }
    assert corpus == want


def test_ranked_edges_deskewed_hub(spark):
    # a 500-out-edge hub: ranks must be the exact 0..deg-1 permutation of
    # the (shard, dst) order, and no window in the plan partitions by
    # src ALONE over the raw adjacency (the hub would sort in one task)
    import contextlib
    import io

    hub_rows = [("hub", f"t{i:04d}", 1.0) for i in range(500)]
    df = spark.createDataFrame(hub_rows, SCHEMA)
    ranked = _ranked_edges(df)
    got = sorted(
        (r["_rk"], r["dst"], r["_deg"]) for r in ranked.collect()
    )
    order = sorted(
        (d for _, d, _ in hub_rows),
        key=lambda d: (_h64(d) % N_RANK_SHARDS, d),
    )
    assert got == [(i, d, 500) for i, d in enumerate(order)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ranked.explain("extended")
    plan = buf.getvalue()
    # the row_number window is keyed by (src, shard), never src alone
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_sh" in line, line


def test_walks_stop_at_dangling(spark):
    rows = [("a", "b", 1.0)]  # b has no out-edges
    df = spark.createDataFrame(rows, SCHEMA)
    starts = spark.createDataFrame([("a",)], "conv_id string")
    got = sorted(
        (r["step"], r["conv_id"])
        for r in random_walks(df, starts, walk_length=5).collect()
    )
    assert got == [(0, "a"), (1, "b")]  # stops, no padding
