"""HITS hubs & authorities vs the numpy power-iteration oracle."""

from unarxive_spark.operators.hits import hits

from tests.oracles import hits_oracle


def _rows(edges_df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in edges_df.collect()
    ]


def test_hits_star(spark):
    # directed star: center cites every leaf -> center is the sole hub,
    # leaves split authority evenly
    rows = [("hub", f"l{i}", 1.0) for i in range(4)]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    got = {
        r["conv_id"]: (r["hub"], r["authority"])
        for r in hits(df, n_iter=5).scores.collect()
    }
    assert abs(got["hub"][0] - 1.0) < 1e-12 and got["hub"][1] == 0.0
    for i in range(4):
        h, a = got[f"l{i}"]
        assert h == 0.0 and abs(a - 0.25) < 1e-12


def test_hits_zipf_matches_numpy(edges_small):
    res = hits(edges_small, n_iter=8)
    got = {
        r["conv_id"]: (r["hub"], r["authority"])
        for r in res.scores.collect()
    }
    want = hits_oracle(_rows(edges_small), n_iter=8)
    assert set(got) == set(want)
    worst = max(
        max(abs(got[v][0] - want[v][0]), abs(got[v][1] - want[v][1]))
        for v in want
    )
    assert worst < 1e-9, worst
    # L1-normalized: both score columns sum to 1 on a graph with edges
    assert abs(sum(g[0] for g in got.values()) - 1.0) < 1e-9
    assert abs(sum(g[1] for g in got.values()) - 1.0) < 1e-9
