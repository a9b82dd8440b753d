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


def test_scc_many_disjoint_cycles_parallel_pivots(spark):
    # 50 disjoint 4-cycles: the WCC coloring yields one pivot per cycle,
    # so ALL 50 SCCs resolve in a single pivot round (the old one-pivot
    # loop needed 50 rounds here)
    rows = []
    for c in range(50):
        ids = [f"cy{c:02d}_{i}" for i in range(4)]
        rows += [
            (ids[i], ids[(i + 1) % 4], 1.0) for i in range(4)
        ]
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    res = strongly_connected_components(df)
    got = {r["conv_id"]: r["component"] for r in res.components.collect()}
    assert got == scc_oracle(rows)
    assert res.pivot_rounds <= 2


def test_scc_chain_of_cycles(spark):
    # 3 cycles linked in a directed chain (ONE weak component): the
    # pseudo-random pivot + F/B/R region split keeps rounds sublinear
    # in the number of SCCs (labels still exactly match Tarjan)
    rows = []
    for c in range(3):
        ids = [f"ch{c}_{i}" for i in range(3)]
        rows += [(ids[i], ids[(i + 1) % 3], 1.0) for i in range(3)]
        if c:
            rows.append((f"ch{c - 1}_0", f"ch{c}_0", 1.0))
    df = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    res = strongly_connected_components(df)
    got = {r["conv_id"]: r["component"] for r in res.components.collect()}
    assert got == scc_oracle(rows)
    assert res.pivot_rounds <= 3


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
