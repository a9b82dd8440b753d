"""Personalized PageRank vs the numpy oracle."""

from unarxive_spark.operators.pagerank import pagerank

from tests.oracles import pagerank_oracle


def _rows(df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in df.collect()
    ]


def test_ppr_matches_oracle_and_localizes(edges_small):
    sources = ["c000007", "c000011"]
    res = pagerank(
        edges_small, tol=1e-9, max_iter=200, personalization=sources
    )
    assert res.converged
    got = {r["conv_id"]: r["rank"] for r in res.ranks.collect()}
    want = pagerank_oracle(
        _rows(edges_small), tol=1e-9, max_iter=200, personalization=sources
    )
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # localization: the teleport sources outrank the global median
    ranks_sorted = sorted(got.values())
    median = ranks_sorted[len(ranks_sorted) // 2]
    for s in sources:
        assert got[s] > median

    # and it differs from the classic uniform-teleport result
    uni = pagerank(edges_small, tol=1e-9, max_iter=200)
    got_u = {r["conv_id"]: r["rank"] for r in uni.ranks.collect()}
    assert max(abs(got[v] - got_u[v]) for v in got) > 1e-3
