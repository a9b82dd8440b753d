"""Deterministic handshake maximal matching vs a pure-Python replay of
the same rounds, plus matching/maximality invariants; and IC influence
spread vs a python simulation with the identical h64 coins."""

import hashlib
import random

import pytest

from unarxive_spark.operators.influence import ic_influence_spread
from unarxive_spark.operators.matching import maximal_matching

SCHEMA = "src_conv_id string, dst_conv_id string"


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _key(v: str) -> tuple[int, str]:
    return (_h64("mm|" + v), v)


def _replay(edge_rows, rounds=None):
    """Python handshake replay: u proposes min-key live neighbor."""
    adj = {}
    for u, v in edge_rows:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    live = set(adj)
    out = {}
    r = 0
    while rounds is None or r < rounds:
        props = {
            u: min((n for n in adj[u] if n in live), key=_key, default=None)
            for u in live
        }
        matched = {
            (u, t)
            for u, t in props.items()
            if t is not None and props.get(t) == u and u < t
        }
        if not matched and rounds is None:
            break
        for u, t in matched:
            out[(u, t)] = r
            live.discard(u)
            live.discard(t)
        r += 1
        if rounds is None and not any(
            any(n in live for n in adj[u]) for u in live
        ):
            break
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.conv_a, r.conv_b): r["round"]
        for r in maximal_matching(df, **kw).collect()
    }


@pytest.mark.parametrize("seed", [1, 2])
def test_matching_random_graphs_converged(spark, seed):
    rng = random.Random(seed)
    rows = list(
        {
            (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}")
            for _ in range(90)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    got = _run(spark, rows)
    assert got == _replay(rows)
    # matching invariant: every vertex at most once
    seen = [x for pair in got for x in pair]
    assert len(seen) == len(set(seen))
    # maximality: no edge with both endpoints unmatched
    matched_v = set(seen)
    assert all(
        u in matched_v or v in matched_v for u, v in rows if u != v
    )


def test_matching_fixed_rounds_truncates_identically(spark):
    rng = random.Random(7)
    rows = [
        (f"v{rng.randrange(20)}", f"v{rng.randrange(20)}") for _ in range(50)
    ]
    rows = [(u, v) for u, v in set(rows) if u != v]
    got = _run(spark, rows, fixed_rounds=1)
    assert got == _replay(rows, rounds=1)
    assert all(r == 0 for r in got.values())


def test_matching_path_handshake(spark):
    # path a-b-c-d: b,c propose their min-key neighbors; exactly the
    # replay's pairs match in round 0, remainder in later rounds
    rows = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, rows)
    assert got == _replay(rows)
    assert len(got) >= 1


def _ic_replay(edge_rows, n_sims, p_permille, n_seeds, hops):
    de = sorted({(u, v) for u, v in edge_rows if u != v})
    verts = sorted({x for e in de for x in e})
    seeds = sorted(verts, key=lambda v: (_h64("icseed|" + v), v))[:n_seeds]
    out = {}
    for s in range(n_sims):
        live = [
            (u, v)
            for u, v in de
            if _h64(f"{u}>{v}#ic{s}") % 1000 < p_permille
        ]
        fwd = {}
        for u, v in live:
            fwd.setdefault(u, []).append(v)
        reached = set(seeds)
        frontier = set(seeds)
        for _ in range(hops):
            frontier = {
                v for u in frontier for v in fwd.get(u, [])
            } - reached
            reached |= frontier
        out[s] = (len(live), len(reached))
    return out


def test_influence_matches_python_simulation(spark):
    rng = random.Random(11)
    rows = list(
        {
            (f"v{rng.randrange(25)}", f"v{rng.randrange(25)}")
            for _ in range(80)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.sim_id: (r.n_live_edges, r.n_reached)
        for r in ic_influence_spread(
            df, n_sims=3, p_permille=400, n_seeds=2, hops=3
        ).collect()
    }
    assert got == _ic_replay(rows, 3, 400, 2, 3)


def test_influence_p_zero_reaches_only_seeds(spark):
    rows = [("a", "b"), ("b", "c")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = ic_influence_spread(
        df, n_sims=2, p_permille=0, n_seeds=2, hops=3
    ).collect()
    assert all(r.n_live_edges == 0 and r.n_reached == 2 for r in got)


def test_influence_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", "b")], SCHEMA)
    with pytest.raises(ValueError):
        ic_influence_spread(df, n_sims=0)


def test_bowtie_census_planted_regions(spark):
    from unarxive_spark.operators.bowtie import bowtie_census

    # core 3-cycle {c1,c2,c3}; i1 -> core (IN); core -> o1 -> o2 (OUT);
    # t1 -> i1 (also IN: reaches core through i1); x1 -> x2 disconnected
    rows = [
        ("c1", "c2"),
        ("c2", "c3"),
        ("c3", "c1"),
        ("i1", "c1"),
        ("c2", "o1"),
        ("o1", "o2"),
        ("t1", "i1"),
        ("x1", "x2"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.region: r.n_vertices for r in bowtie_census(df).collect()}
    assert got == {"scc": 3, "in": 2, "out": 2, "other": 2}


def test_bowtie_census_no_giant_ties_break_deterministically(spark):
    from unarxive_spark.operators.bowtie import bowtie_census

    # two 2-cycles of equal size: the giant is the min-component-id one
    # ({a1,a2}, labeled a1) — the other 2-cycle neither reaches nor is
    # reached, so it lands in 'other'
    rows = [("a1", "a2"), ("a2", "a1"), ("b1", "b2"), ("b2", "b1")]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.region: r.n_vertices for r in bowtie_census(df).collect()}
    assert got == {"scc": 2, "in": 0, "out": 0, "other": 2}


def test_matching_rejects_zero_rounds(spark):
    """r5 ADVICE: fixed_rounds=0 used to crash with IndexError."""
    df = spark.createDataFrame([("a", "b")], SCHEMA)
    with pytest.raises(ValueError, match="fixed_rounds"):
        maximal_matching(df, fixed_rounds=0)
    with pytest.raises(ValueError, match="max_iter"):
        maximal_matching(df, max_iter=0)
