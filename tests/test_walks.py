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


# ---------------------------------------------------------------------
# Weighted + node2vec picks vs pure-Python replays of the same
# cumulative-weight / bias arithmetic
# ---------------------------------------------------------------------


def _ordered_adj(rows):
    """adjacency as [(dst, w)] in the engine's (shard, dst) order,
    weights summed per pair."""
    acc = {}
    for u, v, w in rows:
        acc[(u, v)] = acc.get((u, v), 0) + int(w)
    adj = {}
    for (u, v), w in acc.items():
        adj.setdefault(u, []).append((v, w))
    return {
        u: sorted(vs, key=lambda t: (_h64(t[0]) % N_RANK_SHARDS, t[0]))
        for u, vs in adj.items()
    }


def _pick_by_weight(cands, pick):
    cum = 0
    for dst, w in cands:
        if cum <= pick < cum + w:
            return dst
        cum += w
    raise AssertionError("pick out of range")


def _weighted_oracle(rows, starts, walk_length, seed):
    adj = _ordered_adj(rows)
    out = {}
    for s in starts:
        wid = f"{s}#0"
        path, cur = [s], s
        for step in range(1, walk_length + 1):
            cands = adj.get(cur)
            if not cands:
                break
            tot = sum(w for _, w in cands)
            cur = _pick_by_weight(cands, _h64(f"{seed}|{wid}|{step}") % tot)
            path.append(cur)
        out[wid] = path
    return out


def _node2vec_oracle(rows, starts, walk_length, seed, ret, adj_b, far):
    adj = _ordered_adj(rows)
    eset = {(u, v) for u, v, _ in rows}
    out = {}
    for s in starts:
        wid = f"{s}#0"
        path, cur, prev = [s], s, None
        for step in range(1, walk_length + 1):
            cands = adj.get(cur)
            if not cands:
                break
            biased = []
            for dst, w in cands:
                if prev is None:
                    a = 1
                elif dst == prev:
                    a = ret
                elif (prev, dst) in eset:
                    a = adj_b
                else:
                    a = far
                biased.append((dst, w * a))
            tot = sum(w for _, w in biased)
            nxt = _pick_by_weight(biased, _h64(f"{seed}|{wid}|{step}") % tot)
            prev, cur = cur, nxt
            path.append(cur)
        out[wid] = path
    return out


def _collect_paths(df):
    got = {}
    for r in sorted(df.collect(), key=lambda r: (r["walk_id"], r["step"])):
        got.setdefault(r["walk_id"], []).append(r["conv_id"])
    return got


def test_weighted_walks_match_replay(spark, edges_small):
    rows = [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in edges_small.collect()
    ]
    starts_l = sorted({u for u, _, _ in rows})[:12]
    starts = spark.createDataFrame([(s,) for s in starts_l], "conv_id string")
    got = _collect_paths(
        random_walks(
            edges_small, starts, walk_length=4, seed=9, weight_col="weight"
        )
    )
    assert got == _weighted_oracle(rows, starts_l, 4, 9)
    # a heavy edge must dominate picks: two edges 99:1 — all picks from
    # h64 % 100 land on the heavy edge unless pick >= 99
    heavy = [("x", "h", 99.0), ("x", "l", 1.0)]
    hdf = spark.createDataFrame(heavy, SCHEMA)
    hstarts = spark.createDataFrame([("x",)], "conv_id string")
    hp = _collect_paths(
        random_walks(hdf, hstarts, walk_length=1, seed=9, weight_col="weight")
    )
    assert hp == _weighted_oracle(heavy, ["x"], 1, 9)


def test_weighted_walks_reject_fractional_weight(spark):
    df = spark.createDataFrame([("a", "b", 0.5)], SCHEMA)
    starts = spark.createDataFrame([("a",)], "conv_id string")
    import pytest

    with pytest.raises(Exception, match="positive integers"):
        random_walks(df, starts, walk_length=1, weight_col="weight").collect()


def test_node2vec_walks_match_replay(spark, edges_small):
    from unarxive_spark.operators.walks import node2vec_walks

    rows = [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in edges_small.collect()
    ]
    starts_l = sorted({u for u, _, _ in rows})[:10]
    starts = spark.createDataFrame([(s,) for s in starts_l], "conv_id string")
    for ret, adj_b, far in ((4, 2, 1), (1, 1, 4)):
        got = _collect_paths(
            node2vec_walks(
                edges_small,
                starts,
                walk_length=4,
                seed=5,
                ret_bias=ret,
                adj_bias=adj_b,
                far_bias=far,
                weight_col="weight",
            )
        )
        want = _node2vec_oracle(rows, starts_l, 4, 5, ret, adj_b, far)
        assert got == want


def test_node2vec_return_bias_forces_backtrack(spark):
    from unarxive_spark.operators.walks import node2vec_walks

    # a <-> b plus b -> c,d,e: with an overwhelming return bias every
    # step from b must go back to a
    rows = [("a", "b", 1.0), ("b", "a", 1.0), ("b", "c", 1.0),
            ("b", "d", 1.0), ("b", "e", 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    starts = spark.createDataFrame([("a",)], "conv_id string")
    got = _collect_paths(
        node2vec_walks(
            df, starts, walk_length=6, seed=3,
            ret_bias=10_000, adj_bias=1, far_bias=1,
        )
    )
    path = got["a#0"]
    assert len(path) == 7  # walk_length=6 → 7 visited vertices
    assert all(
        v == ("a" if i % 2 == 0 else "b") for i, v in enumerate(path)
    )
