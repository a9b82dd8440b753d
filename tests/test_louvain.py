"""Louvain local-move supersteps vs a pure-Python replay, plus the
acceptance bar from the round-3 verdict: Q(louvain) >= Q(LPA) on the
property graphs, with deterministic tie-breaks throughout."""

import hashlib
import random
from collections import defaultdict

import pytest

from unarxive_spark.operators.louvain import louvain
from unarxive_spark.operators.lpa import label_propagation
from unarxive_spark.operators.modularity import modularity

SCHEMA = "src_conv_id string, dst_conv_id string, weight double"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def louvain_oracle(rows, max_rounds, levels=1):
    """Exact replay of the engine: synchronous parity-alternating
    local moves with integer gains, min-community tie-break, optional
    contraction levels."""
    und = defaultdict(int)
    for u, v, w in rows:
        if u == v:
            continue
        und[(u, v)] += int(w)
        und[(v, u)] += int(w)
    und = dict(und)
    selfw: dict = {}
    mapping = None
    for level in range(levels):
        # engine contract: parity offset is level*max_rounds (pure
        # function of (level, round) — see operators/louvain.py)
        round_offset = level * max_rounds
        verts = sorted({u for u, _ in und} | set(selfw))
        deg = {x: selfw.get(x, 0) for x in verts}
        adj = defaultdict(dict)
        for (u, v), w in und.items():
            deg[u] += w
            adj[u][v] = w
        tm = sum(deg.values())
        comm = {x: x for x in verts}
        zero = 0
        rounds = 0
        for r in range(max_rounds):
            ctot = defaultdict(int)
            for x in verts:
                ctot[comm[x]] += deg[x]
            newcomm, moves = {}, 0
            for i in verts:
                kic = defaultdict(int)
                for j, w in adj[i].items():
                    kic[comm[j]] += w
                kic.setdefault(comm[i], 0)
                best = None
                for c, kc in kic.items():
                    tot = ctot[c] - (deg[i] if c == comm[i] else 0)
                    gain = tm * kc - deg[i] * tot
                    key = (-gain, c)
                    if best is None or key < best[0]:
                        best = (key, c, gain)
                stay = tm * kic[comm[i]] - deg[i] * (ctot[comm[i]] - deg[i])
                eligible = _h64(i) % 2 == (round_offset + r) % 2
                if eligible and best[2] > stay:
                    newcomm[i] = best[1]
                    if best[1] != comm[i]:
                        moves += 1
                else:
                    newcomm[i] = comm[i]
            comm = newcomm
            rounds = r + 1
            if moves == 0:
                zero += 1
                if zero >= 2:
                    break
            else:
                zero = 0
        mapping = (
            dict(comm)
            if mapping is None
            else {x: comm[c] for x, c in mapping.items()}
        )
        if level == levels - 1:
            break
        newund, newself = defaultdict(int), defaultdict(int)
        for (u, v), w in und.items():
            cu, cv = comm[u], comm[v]
            if cu == cv:
                newself[cu] += w
            else:
                newund[(cu, cv)] += w
        for v, sw in selfw.items():
            newself[comm[v]] += sw
        und, selfw = dict(newund), dict(newself)
    return mapping


def _rand_graph(seed, n=14, m=30):
    rng = random.Random(seed)
    rows = set()
    while len(rows) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            rows.add((f"v{a:02d}", f"v{b:02d}", float(rng.randint(1, 3))))
    return sorted(rows)


def _two_cliques(k=5, bridge=True):
    rows = []
    for grp, off in (("a", 0), ("b", 100)):
        for i in range(k):
            for j in range(i + 1, k):
                rows.append((f"{grp}{off + i}", f"{grp}{off + j}", 2.0))
    if bridge:
        rows.append(("a0", "b100", 1.0))
    return rows


def _labels_of(res):
    return {r["conv_id"]: r["comm"] for r in res.labels.collect()}


def test_louvain_matches_python_replay(spark):
    for seed in (1, 5):
        rows = _rand_graph(seed)
        df = spark.createDataFrame(rows, SCHEMA)
        res = louvain(df, max_rounds=5)
        assert _labels_of(res) == louvain_oracle(rows, 5)


def test_louvain_two_level_matches_replay(spark):
    rows = _rand_graph(3, n=16, m=40)
    df = spark.createDataFrame(rows, SCHEMA)
    res = louvain(df, max_rounds=5, levels=2)
    assert res.levels == 2
    assert _labels_of(res) == louvain_oracle(rows, 5, levels=2)


def test_louvain_finds_planted_cliques(spark):
    rows = _two_cliques()
    df = spark.createDataFrame(rows, SCHEMA)
    res = louvain(df, max_rounds=8, levels=2)
    got = _labels_of(res)
    a = {c for v, c in got.items() if v.startswith("a")}
    b = {c for v, c in got.items() if v.startswith("b")}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert res.converged


def test_louvain_beats_or_ties_lpa_modularity(spark):
    """The verdict's acceptance bar: Q(louvain) >= Q(LPA)."""
    for rows in (_rand_graph(7), _two_cliques()):
        df = spark.createDataFrame(rows, SCHEMA)
        q_louv = modularity(df, louvain(df, max_rounds=8, levels=2).labels
                            .withColumnRenamed("comm", "label"))
        q_lpa = modularity(
            df, label_propagation(df, n_iter=3).labels
        )
        assert q_louv >= q_lpa - 1e-9, (q_louv, q_lpa)


def test_louvain_rejects_fractional_weight(spark):
    df = spark.createDataFrame([("a", "b", 0.5)], SCHEMA)
    with pytest.raises(Exception, match="positive integers"):
        louvain(df, max_rounds=2).labels.collect()
