"""Triad census vs a brute-force C(n,3) python enumeration, plus
planted fixtures for the orientation-sensitive classes."""

import random
from itertools import combinations

import pytest

from unarxive_spark.operators.triads import TRIAD_TYPES, _SLOT, _canon, triad_census

SCHEMA = "src_conv_id string, dst_conv_id string"


def _brute(rows):
    de = {(u, v) for u, v in rows if u != v}
    verts = sorted({x for e in de for x in e})
    out = {t: 0 for t in TRIAD_TYPES.values()}
    for trip in combinations(verts, 3):
        code = 0
        for (i, j), s in _SLOT.items():
            if (trip[i], trip[j]) in de:
                code |= 1 << s
        out[TRIAD_TYPES[_canon(code)]] += 1
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.triad_type: r.n_triads for r in triad_census(df).collect()}


def test_triad_type_table_is_complete():
    assert len(TRIAD_TYPES) == 16
    assert set(TRIAD_TYPES.values()) == {
        "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
        "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
    }


@pytest.mark.parametrize("seed", [1, 2])
def test_triad_census_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    rows = list(
        {
            (f"v{rng.randrange(18)}", f"v{rng.randrange(18)}")
            for _ in range(60)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    got = _run(spark, rows)
    want = _brute(rows)
    assert got == want
    # census completeness: all triples accounted for
    n = len({x for e in rows for x in e})
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_planted_orientations(spark):
    # transitive triangle + cycle + out-star + in-star + mutual pair,
    # on disjoint vertex sets so each triple is unambiguous
    rows = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),  # 030T
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),  # 030C
        ("c1", "c2"), ("c1", "c3"),                # 021D (out-star)
        ("d2", "d1"), ("d3", "d1"),                # 021U (in-star)
        ("e1", "e2"), ("e2", "e1"),                # mutual dyad
    ]
    got = _run(spark, rows)
    assert got == _brute(rows)
    assert got["030T"] == 1 and got["030C"] == 1
    assert got["021D"] == 1 and got["021U"] == 1
    # the mutual pair contributes n-2 single-mutual (102) triads
    # beyond any it forms with the other clusters (brute pins exact)
    assert got["102"] >= 1


def test_triad_census_no_forced_broadcast_above_gate(spark):
    """r5 verdict #2: the O(E) dyad table must not be force-broadcast
    at scale. With the gate set below the pair count, the dyad-bit
    lookup loses its broadcast hint (one BroadcastExchange fewer in
    the initial plan); the census is unchanged either way."""

    def _hints(df_):
        # the ANALYZED logical plan keeps ResolvedHint nodes; at this
        # fixture scale the physical planner auto-broadcasts everything
        # from size estimates, so the hint presence is the honest signal
        return df_._jdf.queryExecution().analyzed().toString().count(
            "ResolvedHint"
        )

    rng = random.Random(3)
    rows = list(
        {
            (f"v{rng.randrange(15)}", f"v{rng.randrange(15)}")
            for _ in range(50)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    df = spark.createDataFrame(rows, SCHEMA)
    gated = triad_census(df, eager=False, broadcast_pairs_max=0)
    plan_off = gated._sc._jvm.PythonSQLUtils.explainString(
        gated._jdf.queryExecution(), "formatted"
    )
    assert "_c3" in plan_off  # the dyad-bit lookup exists
    # gated off: strictly fewer broadcast hints (the dyad-table hint is
    # gone; the remaining ones are 1-row scalars + the 16-row dim)
    assert _hints(gated) < _hints(triad_census(df, eager=False))
    got = {r.triad_type: r.n_triads for r in
           triad_census(df, broadcast_pairs_max=0).collect()}
    assert got == _brute(rows)


def test_triad_census_max_degree_caps_hubs(spark):
    """max_degree drops mega-hub vertices before counting: the result
    equals the exact census of the hub-free induced subgraph."""
    # hub h touches every spoke (degree 6); spokes form a triangle
    rows = [("h", f"s{i}") for i in range(6)]
    rows += [("s0", "s1"), ("s1", "s2"), ("s0", "s2")]
    got = _run_capped(spark, rows, max_degree=5)
    capped_rows = [(u, v) for u, v in rows if u != "h" and v != "h"]
    assert got == _brute(capped_rows)


def _run_capped(spark, rows, max_degree):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.triad_type: r.n_triads
        for r in triad_census(df, max_degree=max_degree).collect()
    }
