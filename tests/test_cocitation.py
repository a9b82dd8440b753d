"""Co-citation / bibliographic coupling: brute-force oracle + hub cap.

The max_degree cap is the scale guard: the self-join on the shared
endpoint fans out quadratically in that endpoint's degree, so a single
mega-hub citer contributes O(d^2) candidate pairs. The cap drops those
hubs from candidate generation entirely.
"""

import itertools

import pytest

from unarxive_spark.operators.cocitation import (
    bibliographic_coupling,
    co_citation,
)

SCHEMA = "src_conv_id string, dst_conv_id string, weight double"


def _cocite_oracle(rows, min_count=1, max_degree=None):
    """Pure-Python co-citation over distinct (src, dst)."""
    by_src = {}
    for s, d, _ in rows:
        by_src.setdefault(s, set()).add(d)
    pairs = {}
    for s, dsts in by_src.items():
        if max_degree is not None and len(dsts) > max_degree:
            continue
        for a, b in itertools.combinations(sorted(dsts), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {p: n for p, n in pairs.items() if n >= min_count}


@pytest.fixture(scope="module")
def hub_graph(spark):
    # 3 normal citers sharing targets + 1 mega-hub citing everything
    rows = []
    targets = [f"t{i:02d}" for i in range(20)]
    rows += [("s0", t, 1.0) for t in targets[:4]]
    rows += [("s1", t, 1.0) for t in targets[:4]]
    rows += [("s2", t, 1.0) for t in targets[2:6]]
    rows += [("hub", t, 1.0) for t in targets]  # degree 20
    return (
        spark.createDataFrame(rows, SCHEMA).cache(),
        rows,
    )


def test_co_citation_matches_oracle(hub_graph):
    df, rows = hub_graph
    got = {
        (r["a"], r["b"]): r["n_common_citers"]
        for r in co_citation(df, min_count=1).collect()
    }
    assert got == _cocite_oracle(rows, min_count=1)


def test_co_citation_cap_drops_hub(hub_graph):
    df, rows = hub_graph
    capped = {
        (r["a"], r["b"]): r["n_common_citers"]
        for r in co_citation(df, min_count=1, max_degree=10).collect()
    }
    assert capped == _cocite_oracle(rows, min_count=1, max_degree=10)
    # the hub alone supported C(20,2)=190 pairs; capped candidates are
    # bounded by the low-degree citers only
    uncapped = co_citation(df, min_count=1).count()
    assert uncapped >= 190
    assert co_citation(df, min_count=1, max_degree=10).count() <= 15


def test_biblio_coupling_cap(spark):
    # mirror image: one mega-cited target couples all its citers
    rows = [(f"s{i:02d}", "hubT", 1.0) for i in range(20)]
    rows += [("s00", "x", 1.0), ("s01", "x", 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    assert bibliographic_coupling(df).count() == 190 + 0  # (s00,s01) via hubT too
    capped = {
        (r["a"], r["b"])
        for r in bibliographic_coupling(df, max_degree=10).collect()
    }
    assert capped == {("s00", "s01")}  # only the degree-2 target survives


def test_driver_cap_binds_and_matches_duckdb(spark):
    """q19a/q19b at sf0.001: the capped engine result must equal the
    capped DuckDB oracle (full value compare, not just counts)."""
    import duckdb

    from unarxive_spark.plans.driver_queries import (
        SQL_BIBLIO_COUPLING,
        SQL_CO_CITATION,
        q_biblio_coupling,
        q_co_citation,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    for fn, sql in (
        (q_co_citation, SQL_CO_CITATION),
        (q_biblio_coupling, SQL_BIBLIO_COUPLING),
    ):
        got = sorted(map(tuple, fn(spark, "/root/testdata/sf0.001").collect()))
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == want


def test_neighbor_jaccard_matches_oracle(hub_graph):
    from unarxive_spark.operators.cocitation import neighbor_jaccard

    df, rows = hub_graph
    # python oracle over hub-filtered undirected neighborhoods
    adj = {}
    for s, d, _ in rows:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    cap = 10
    # neighbors kept only if the NEIGHBOR's degree <= cap (shared-endpoint
    # filter removes hub rows from every neighborhood)
    filt = {
        v: {u for u in ns if len(adj[u]) <= cap} for v, ns in adj.items()
    }
    want = {}
    verts = sorted(filt)
    for i, a in enumerate(verts):
        for b in verts[i + 1 :]:
            shared = filt[a] & filt[b]
            if len(shared) >= 1:
                union = len(filt[a]) + len(filt[b]) - len(shared)
                want[(a, b)] = (len(shared), len(shared) / union)
    got = {
        (r["a"], r["b"]): (r["n_shared"], r["sim"])
        for r in neighbor_jaccard(
            df, min_shared=1, max_degree=cap
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12


def test_adamic_adar_matches_oracle(hub_graph):
    import math

    from unarxive_spark.operators.cocitation import adamic_adar

    df, rows = hub_graph
    adj = {}
    for s, d, _ in rows:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    cap = 10
    filt = {
        v: {u for u in ns if len(adj[u]) <= cap} for v, ns in adj.items()
    }
    want = {}
    verts = sorted(filt)
    for i, a in enumerate(verts):
        for b in verts[i + 1 :]:
            shared = {
                u for u in filt[a] & filt[b] if len(adj[u]) >= 2
            }
            if not shared:
                continue
            aa_e9 = sum(
                int(round(1e9 / math.log(len(adj[u])))) for u in shared
            )
            want[(a, b)] = (len(filt[a] & filt[b]), aa_e9)
    got = {
        (r["a"], r["b"]): (r["n_shared"], r["aa_e9"], r["aa"])
        for r in adamic_adar(df, min_shared=1, max_degree=cap).collect()
    }
    # rows only exist where a weighted (deg>=2) shared neighbor exists
    assert got.keys() == want.keys()
    for k, (n, e9) in want.items():
        assert got[k][1] == e9, k  # exact integer sum, no float drift
        assert got[k][2] == round(e9 / 1e9, 6)
