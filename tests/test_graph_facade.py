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
