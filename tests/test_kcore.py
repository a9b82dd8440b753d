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


def _core_numbers_oracle(rows, k_max=64):
    out = {}
    k = 1
    while k <= k_max:
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
        r["conv_id"]: r["core"]
        for r in core_numbers(edges_small, k_max=16).collect()
    }
    assert got == _core_numbers_oracle(rows, k_max=16)
