"""k-core decomposition vs pure-Python peeling oracle."""

import pytest

from unarxive_spark.operators.kcore import core_numbers, k_core


def _kcore_oracle(rows, k):
    adj = {}
    for u, v, _ in rows:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return set(adj)


def _core_numbers_oracle(rows):
    out = {}
    k = 1
    while True:
        members = _kcore_oracle(rows, k)
        if not members:
            break
        for v in members:
            out[v] = k
        k += 1
    # vertices never in any >=1-core still appear with core 0
    verts = {u for u, v, _ in rows if u != v} | {
        v for u, v, _ in rows if u != v
    }
    for v in verts:
        out.setdefault(v, 0)
    return out


def _rows(edges_df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in edges_df.collect()
    ]


def test_kcore_golden(spark):
    # triangle + pendant: 2-core = the triangle, 3-core empty
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0),
            ("c", "d", 1.0)]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    got2 = {r["conv_id"] for r in k_core(df, 2).collect()}
    assert got2 == {"a", "b", "c"} == _kcore_oracle(rows, 2)
    assert k_core(df, 3).count() == 0


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_zipf(edges_small, k):
    rows = _rows(edges_small)
    got = {r["conv_id"] for r in k_core(edges_small, k).collect()}
    assert got == _kcore_oracle(rows, k)


def test_core_numbers_zipf(edges_small):
    rows = _rows(edges_small)
    got = {
        r["conv_id"]: r["core"] for r in core_numbers(edges_small).collect()
    }
    assert got == _core_numbers_oracle(rows)


def test_core_numbers_many_distinct_cores(spark):
    # disjoint cliques K2..K7 (cores 1..6) + a pendant off K7 (core 1):
    # ≥5 distinct core values, one h-index loop resolves ALL of them —
    # no per-k peeling, supersteps independent of the max core
    rows = []
    for size in range(2, 8):
        ids = [f"k{size}_{i}" for i in range(size)]
        rows += [
            (ids[i], ids[j], 1.0)
            for i in range(size)
            for j in range(i + 1, size)
        ]
    rows.append(("k7_0", "pendant", 1.0))
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    got = {r["conv_id"]: r["core"] for r in core_numbers(df).collect()}
    want = _core_numbers_oracle(rows)
    assert got == want
    assert len(set(want.values())) >= 5
