"""Property-based graph tests (SURVEY.md §5): random seeded graphs —
chains, hubs, cliques, disconnected pieces all arise from the generator —
checked against the pure-Python oracles.

Spark jobs are slow, so examples are few and graphs small; determinism
comes from hypothesis's own seeding plus derandomize mode.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from unarxive_spark.operators.components import connected_components
from unarxive_spark.operators.pagerank import pagerank
from unarxive_spark.operators.triangles import triangle_count

from tests.oracles import (
    components_oracle,
    pagerank_oracle,
    triangles_oracle,
)

N_VERTS = 12

edge_lists = st.lists(
    st.tuples(
        st.integers(0, N_VERTS - 1),
        st.integers(0, N_VERTS - 1),
        st.integers(1, 3),
    ),
    min_size=1,
    max_size=25,
).map(
    lambda rows: sorted(
        {
            (f"v{a:02d}", f"v{b:02d}", float(w))
            for a, b, w in rows
            if a != b
        }
    )
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(edge_lists)
def test_graph_ops_match_oracles(spark, rows):
    # dedupe parallel edges by (src,dst): keep max weight for determinism
    best = {}
    for s_, d, w in rows:
        best[(s_, d)] = max(best.get((s_, d), 0.0), w)
    rows = [(s_, d, w) for (s_, d), w in sorted(best.items())]
    df = _df(spark, rows)

    pr = pagerank(df, tol=1e-9, max_iter=200)
    assert pr.converged
    got = {r["conv_id"]: r["rank"] for r in pr.ranks.collect()}
    want = pagerank_oracle(rows, tol=1e-9, max_iter=200)
    assert set(got) == set(want)
    if not rows:
        # all-self-loop inputs collapse to the empty graph: both engine
        # and oracle must agree it has no vertices
        assert got == {}
        return
    assert max(abs(got[v] - want[v]) for v in want) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9

    cc = connected_components(df)
    got_cc = {r["conv_id"]: r["component"] for r in cc.components.collect()}
    assert got_cc == components_oracle(rows)

    assert triangle_count(df) == triangles_oracle(rows)


# ---------------- PPJoin losslessness (random docs) ----------------

_words = st.sampled_from(
    ["the", "fast", "query", "join", "scan", "table", "spark", "batch"]
)
_docs = st.lists(
    st.lists(_words, min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_docs, threshold=st.sampled_from([0.2, 0.5, 0.8]))
def test_jaccard_filters_lossless_property(spark, texts, threshold):
    """Random tiny-vocab docs (worst case for posting lists): the plain,
    length-filtered and prefix+length paths must return IDENTICAL pair
    sets — both filters are provably lossless, this pins the proofs."""
    from unarxive_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def run(**kw):
        return {
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs(
                df, threshold=threshold, **kw
            ).collect()
        }

    plain = run(prefix_filter=False, length_filter=False)
    assert run(prefix_filter=False, length_filter=True) == plain
    assert run(prefix_filter=True, length_filter=True) == plain
