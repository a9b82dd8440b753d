"""SCC (pivot FW-BW) vs a Tarjan oracle."""

from unarxive_spark.datagen import golden_graphs
from unarxive_spark.operators.scc import strongly_connected_components

from tests.oracles import scc_oracle


def _rows(df):
    return [
        (r["src_conv_id"], r["dst_conv_id"], r["weight"])
        for r in df.collect()
    ]


def test_scc_golden(spark):
    g = golden_graphs(spark)
    for name in ("chain", "star", "two_components", "triangle", "self_loop"):
        df = g[name]
        got = {
            r["conv_id"]: r["component"]
            for r in strongly_connected_components(df).components.collect()
        }
        assert got == scc_oracle(_rows(df)), name


def test_scc_zipf(edges_small):
    res = strongly_connected_components(edges_small)
    got = {
        r["conv_id"]: r["component"] for r in res.components.collect()
    }
    want = scc_oracle(
        [
            (r["src_conv_id"], r["dst_conv_id"], r["weight"])
            for r in edges_small.collect()
        ]
    )
    assert got == want
