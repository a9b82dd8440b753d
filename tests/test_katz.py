"""Closed-form fixtures for operators/katz.py (q114 machinery):
path-graph dyadic values, weighted multiplicity, input contracts."""

import pytest

from unarxive_spark.operators.katz import katz_centrality


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )


def test_path_graph_closed_form(spark):
    # a -> b -> c, unit weights, 4 rounds:
    # katz(a) = 1, katz(b) = 1 + 1/2, katz(c) = 1 + 1/2 + 1/4
    e = _edges(spark, [("a", "b", 1.0), ("b", "c", 1.0)])
    got = {r.conv_id: r for r in katz_centrality(e, rounds=4).collect()}
    assert got["a"].katz == 1.0 and got["a"].katz_e == 16
    assert got["b"].katz == 1.5 and got["b"].katz_e == 24
    assert got["c"].katz == 1.75 and got["c"].katz_e == 28
    # walks_in is the length-4 walk count: zero on a 2-edge path
    assert all(got[v].walks_in == 0 for v in "abc")


def test_weighted_multiplicity_and_cycle(spark):
    # weight-3 edge triples the walk count; 2-cycle keeps walks alive
    e = _edges(spark, [("a", "b", 3.0), ("b", "a", 1.0)])
    got = {r.conv_id: r for r in katz_centrality(e, rounds=2).collect()}
    # b: w1=3 (a->b x3), w2=3 (a->b->a->b? no: w2(b)=w1(a)*3=1*3=3)
    # z(b) = ((1*2)+3)*2 + 3 = 13; katz = 13/4
    assert got["b"].katz_e == 13 and got["b"].katz == 3.25
    # a: w1=1, w2=w1(b)*1=3; z(a) = ((1*2)+1)*2 + 3 = 9
    assert got["a"].katz_e == 9 and got["a"].katz == 2.25
    assert got["a"].walks_in == 3 and got["b"].walks_in == 3


def test_multi_edges_collapse_by_weight_sum(spark):
    e = _edges(spark, [("a", "b", 1.0), ("a", "b", 2.0)])
    got = {r.conv_id: r for r in katz_centrality(e, rounds=1).collect()}
    assert got["b"].katz_e == 2 * 1 + 3  # z = 2*z0 + 3
    assert got["b"].walks_in == 3


def test_fractional_weight_raises_in_plan(spark):
    e = _edges(spark, [("a", "b", 0.5)])
    with pytest.raises(Exception, match="positive integers"):
        katz_centrality(e, rounds=1).collect()


def test_rounds_contract(spark):
    with pytest.raises(ValueError):
        katz_centrality(_edges(spark, [("a", "b", 1.0)]), rounds=0)


def test_plan_has_no_quadratic_or_python_nodes(spark, edges_small):
    plan = (
        katz_centrality(edges_small, rounds=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
