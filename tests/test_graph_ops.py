"""L3 graph analytics vs pure-Python/numpy oracles (SURVEY.md §5):
PageRank allclose(1e-6), CC/LPA/triangles exact. Golden shapes + the
seeded Zipf graph."""

import pytest

from unarxive_spark.datagen import golden_graphs
from unarxive_spark.operators.components import connected_components
from unarxive_spark.operators.lpa import label_propagation
from unarxive_spark.operators.pagerank import pagerank
from unarxive_spark.operators.triangles import triangle_count

from tests.oracles import (
    components_oracle,
    lpa_oracle,
    pagerank_oracle,
    triangles_oracle,
)


def _rows(edges_df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in edges_df.collect()
    ]


@pytest.fixture(scope="module")
def goldens(spark):
    return golden_graphs(spark)


# ---------------- PageRank ----------------


@pytest.mark.parametrize(
    "name", ["chain", "star", "two_components", "triangle", "self_loop"]
)
def test_pagerank_golden(goldens, name):
    df = goldens[name]
    res = pagerank(df, tol=1e-9, max_iter=200)
    assert res.converged
    got = {r["conv_id"]: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(_rows(df), tol=1e-9, max_iter=200)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (name, v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_pagerank_zipf_graph(edges_small):
    res = pagerank(edges_small, tol=1e-8, max_iter=100)
    assert res.converged
    got = {r["conv_id"]: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(_rows(edges_small), tol=1e-8, max_iter=100)
    assert len(got) == len(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst < 1e-6, worst
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # hub fixture: a hub vertex holds the top PageRank
    top = max(got, key=got.get)
    assert top in {f"c{i:06d}" for i in range(5)}


def test_pagerank_caller_vertices_dangling(spark):
    # caller-supplied vertex table that OMITS an edge source (c): the
    # dangler count must come from the vertex table's has_out flag, not
    # n - count(edge sources) — the latter evaluates to 0 here and lets
    # b's rank mass leak (sum < 1) instead of redistributing
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "a", 1.0)],
        "src_conv_id string, dst_conv_id string, weight double",
    )
    verts = spark.createDataFrame([("a",), ("b",)], "conv_id string")
    res = pagerank(edges, tol=1e-9, max_iter=200, vertices=verts)
    got = {r["conv_id"]: r["rank"] for r in res.ranks.collect()}
    assert set(got) == {"a", "b"}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # restricted graph == {a→b}: match the pure-Python oracle on it
    want = pagerank_oracle([("a", "b", 1.0)], tol=1e-9, max_iter=200)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


def test_pagerank_unweighted_differs(goldens):
    # star with a doubled-weight edge: weighted vs unweighted must differ
    df = goldens["star"]
    spark = df.sparkSession
    df2 = spark.createDataFrame(
        [("c000001", "c000000", 5.0), ("c000001", "c000005", 1.0)]
        + [(f"c{i:06d}", "c000000", 1.0) for i in range(2, 6)],
        "src_conv_id string, dst_conv_id string, weight double",
    )
    rw = pagerank(df2, tol=1e-9, weighted=True)
    ru = pagerank(df2, tol=1e-9, weighted=False)
    got_w = {r["conv_id"]: r["rank"] for r in rw.ranks.collect()}
    got_u = {r["conv_id"]: r["rank"] for r in ru.ranks.collect()}
    assert abs(got_w["c000000"] - got_u["c000000"]) > 1e-4
    for flag, got in [(True, got_w), (False, got_u)]:
        want = pagerank_oracle(_rows(df2), tol=1e-9, weighted=flag)
        assert all(abs(got[v] - want[v]) < 1e-6 for v in want)


# ---------------- Connected components ----------------


@pytest.mark.parametrize(
    "name", ["chain", "star", "two_components", "triangle", "self_loop"]
)
def test_components_golden(goldens, name):
    df = goldens[name]
    res = connected_components(df)
    assert res.converged
    got = {r["conv_id"]: r["component"] for r in res.components.collect()}
    assert got == components_oracle(_rows(df))


def test_components_zipf(edges_small):
    res = connected_components(edges_small)
    assert res.converged
    got = {r["conv_id"]: r["component"] for r in res.components.collect()}
    assert got == components_oracle(_rows(edges_small))


def test_components_shortcut_log_convergence(spark):
    # 200-vertex path: plain hash-min needs ~199 supersteps (label
    # travels one hop per round); pointer jumping doubles the travel
    # distance each round, so 12 iterations suffice — and the labels
    # are the identical fixpoint (component = min conv_id)
    rows = [
        (f"p{i:03d}", f"p{i + 1:03d}", 1.0) for i in range(199)
    ]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    res = connected_components(df, max_iter=12, shortcut=True)
    assert res.converged, res.iterations
    got = {r["conv_id"]: r["component"] for r in res.components.collect()}
    assert got == components_oracle(_rows(df))


# ---------------- Label propagation ----------------


@pytest.mark.parametrize("name", ["chain", "star", "two_components", "triangle"])
def test_lpa_golden(goldens, name):
    df = goldens[name]
    res = label_propagation(df, n_iter=4)
    got = {r["conv_id"]: r["label"] for r in res.labels.collect()}
    assert got == lpa_oracle(_rows(df), n_iter=4)


def test_lpa_zipf(edges_small):
    res = label_propagation(edges_small, n_iter=3)
    got = {r["conv_id"]: r["label"] for r in res.labels.collect()}
    want = lpa_oracle(_rows(edges_small), n_iter=3)
    assert got == want


# ---------------- Triangles ----------------


@pytest.mark.parametrize(
    "name,expect",
    [("chain", 0), ("star", 0), ("triangle", 1), ("self_loop", 0)],
)
def test_triangles_golden(goldens, name, expect):
    df = goldens[name]
    assert triangle_count(df) == expect == triangles_oracle(_rows(df))


def test_triangles_zipf(edges_small):
    assert triangle_count(edges_small) == triangles_oracle(_rows(edges_small))


def test_triangle_orientation_bounds_hub_wedges(spark):
    """Degree-ordered orientation (node-iterator++) gives the mega-hub
    out-degree 0, so it pivots ZERO wedges; lexicographic orientation on
    the same star generates |below|x|above| = quadratic-in-degree wedges.
    This is the shape that decides whether the wedge join survives a
    power-law 100x graph."""
    from unarxive_spark.operators.triangles import canonical_edges, wedges

    hub = "m500"  # lexicographically between the a* and z* leaves
    leaves = [f"a{i:03d}" for i in range(30)] + [f"z{i:03d}" for i in range(30)]
    rows = [(hub, leaf, 1.0) for leaf in leaves]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    w_deg = wedges(canonical_edges(df, by_degree=True)).count()
    w_lex = wedges(canonical_edges(df, by_degree=False)).count()
    assert w_lex == 30 * 30  # hub pivots every (below, above) pair
    assert w_deg == 0  # hub has no out-edges under degree order
    assert triangle_count(df) == 0


def test_triangle_count_hub_with_triangles(spark):
    """Counts stay exact under degree ordering when the hub participates
    in triangles (hub + leaf-leaf closing edges)."""
    hub = "m500"
    leaves = [f"a{i:03d}" for i in range(10)]
    rows = [(hub, leaf, 1.0) for leaf in leaves]
    # close 4 triangles through the hub + one leaf-only triangle edge set
    rows += [("a000", "a001", 1.0), ("a002", "a003", 1.0),
             ("a004", "a005", 1.0), ("a006", "a007", 1.0),
             ("a000", "a002", 1.0), ("a001", "a002", 1.0)]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    assert triangle_count(df) == triangles_oracle(_rows(df))
