"""LinkGraph facade smoke: the one-object user path works end-to-end."""

from unarxive_spark.graph import LinkGraph


def test_facade_end_to_end(spark, transcripts_small):
    g = LinkGraph.from_transcripts(transcripts_small).cache()
    pr = g.pagerank(tol=1e-6, max_iter=60)
    assert pr.converged
    ranks = {r["conv_id"]: r["rank"] for r in pr.ranks.collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    cc = g.connected_components()
    assert cc.converged
    assert g.triangle_count() >= 0
    top = g.top_cited(3).collect()
    assert len(top) == 3
    cube = g.category_month_cube()
    assert cube.count() > 0
    ee = g.enriched_edges()
    assert ee.filter("dst_category IS NULL").count() == 0
    m = LinkGraph.resolution_metrics(transcripts_small).collect()[0]
    assert 0 < m["link_rate"] < 1
    # newer facade methods: SCC, SSSP, BFS, modularity
    sp = g.shortest_paths(top[0]["conv_id"], max_rounds=10)
    assert sp.filter("distance = 0").count() == 1
    b = g.bfs([top[0]["conv_id"]], max_hops=2)
    assert b.count() >= 1
    q = g.modularity(g.label_propagation(n_iter=2).labels)
    assert -0.5 <= q <= 1.0


def test_facade_round2_surface(spark, transcripts_small):
    g = LinkGraph.from_transcripts(transcripts_small).cache()
    cc = g.co_citation(min_count=1, max_degree=50)
    bc = g.bibliographic_coupling(min_count=1, max_degree=50)
    assert set(cc.columns) == {"a", "b", "n_common_citers"}
    assert set(bc.columns) == {"a", "b", "n_common_cited"}
    full = g.category_month_cube(full=True)
    assert len(full.columns) == 25  # 2 keys + 23 metrics
    tr = g.taxonomy_rollup()
    assert {"tax_group", "archive", "category"} <= set(tr.columns)
    assert tr.filter("tax_group = 'ALL'").count() == 1  # grand total
    assert g.link_rate_by_day().count() >= 1
