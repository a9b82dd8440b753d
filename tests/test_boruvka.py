"""Borůvka minimum spanning forest vs a pure-Python replay of the same
rounds, plus MST invariants cross-checked against an independent
Kruskal (same composite-key total order, so the forests must be
IDENTICAL, not merely equal-weight)."""

import random

import pytest

from unarxive_spark.operators.boruvka import boruvka_forest

SCHEMA = "src_conv_id string, dst_conv_id string, weight double"


def _pairs(rows):
    pairs = {}
    for u, v, w in rows:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        pairs[(a, b)] = pairs.get((a, b), 0) + int(w)
    return pairs


def _key(a, b, w):
    return f"{w:012d}|{a}|{b}"


def _boruvka_replay(rows, fixed_rounds=None):
    pairs = _pairs(rows)
    comp = {v: v for e in pairs for v in e}
    forest = {}
    rounds = 30 if fixed_rounds is None else fixed_rounds
    for it in range(rounds):
        inter = [(a, b, w) for (a, b), w in pairs.items() if comp[a] != comp[b]]
        if not inter:
            break
        best = {}
        for e in inter:
            a, b, w = e
            for c in (comp[a], comp[b]):
                if c not in best or _key(*e) < _key(*best[c]):
                    best[c] = e
        sel = set(best.values())
        for a, b, w in sel:
            forest[(a, b, w)] = it
        adj = {}
        for a, b, w in sel:
            ca, cb = comp[a], comp[b]
            adj.setdefault(ca, set()).add(cb)
            adj.setdefault(cb, set()).add(ca)
        newlab, seen = {}, set()
        for c in sorted(adj):
            if c in seen:
                continue
            stack, grp = [c], []
            while stack:
                x = stack.pop()
                if x in seen:
                    continue
                seen.add(x)
                grp.append(x)
                stack.extend(adj[x])
            m = min(grp)
            for x in grp:
                newlab[x] = m
        comp = {v: newlab.get(c, c) for v, c in comp.items()}
    return forest


def _kruskal(rows):
    """Independent oracle: Kruskal over the identical total order —
    with unique keys the MSF is unique, so Borůvka must equal it."""
    pairs = _pairs(rows)
    parent = {v: v for e in pairs for v in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(pairs.items(), key=lambda kv: _key(*kv[0], kv[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.conv_a, r.conv_b, r.w): r["round"]
        for r in boruvka_forest(df, **kw).collect()
    }


@pytest.mark.parametrize("seed", [1, 2])
def test_boruvka_matches_replay_and_kruskal(spark, seed):
    rng = random.Random(seed)
    rows = [
        (f"v{rng.randrange(25)}", f"v{rng.randrange(25)}",
         float(rng.randrange(1, 9)))
        for _ in range(70)
    ]
    got = _run(spark, rows)
    assert got == _boruvka_replay(rows)
    # the forest itself equals the unique Kruskal MSF
    assert set(got) == _kruskal(rows)
    # spanning forest invariant: |F| = |V| - #components
    pairs = _pairs(rows)
    verts = {v for e in pairs for v in e}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, ncomp = set(), 0
    for v in verts:
        if v in seen:
            continue
        ncomp += 1
        stack = [v]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj[x])
    assert len(got) == len(verts) - ncomp


def test_boruvka_fixed_rounds_truncates_identically(spark):
    rng = random.Random(9)
    rows = [
        (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}",
         float(rng.randrange(1, 5)))
        for _ in range(60)
    ]
    got = _run(spark, rows, fixed_rounds=1)
    assert got == _boruvka_replay(rows, fixed_rounds=1)
    assert all(r == 0 for r in got.values())


def test_boruvka_parallel_edges_sum_weights(spark):
    # both directions + duplicates collapse to one summed pair
    rows = [("a", "b", 2.0), ("b", "a", 3.0), ("b", "c", 1.0)]
    got = _run(spark, rows)
    assert got == {("a", "b", 5): 0, ("b", "c", 1): 0}


def test_boruvka_rejects_zero_rounds(spark):
    """r5 ADVICE: fixed_rounds=0 used to crash with IndexError."""
    import pytest

    df = spark.createDataFrame(
        [("a", "b", 1.0)],
        "src_conv_id string, dst_conv_id string, weight double",
    )
    with pytest.raises(ValueError, match="fixed_rounds"):
        boruvka_forest(df, fixed_rounds=0)
    with pytest.raises(ValueError, match="max_iter"):
        boruvka_forest(df, max_iter=0)
