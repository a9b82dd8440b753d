"""As-of join vs pandas.merge_asof (independent oracle), plain vs
chunked equivalence, and the range join vs a brute-force predicate."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from unarxive_spark.operators.asof import asof_join
from unarxive_spark.operators.rangejoin import point_in_interval_join

EPOCH = dt.datetime(2024, 1, 1)


def _mk(spark, rows, cols):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=cols)
    )


def _rand_frames(seed, n_left=300, n_right=200, n_keys=6, unique_right=True):
    rng = random.Random(seed)
    left = [
        (
            i,
            rng.randrange(n_keys),
            EPOCH + dt.timedelta(seconds=rng.randrange(100_000)),
            round(rng.uniform(0, 100), 3),
        )
        for i in range(n_left)
    ]
    seen = set()
    right = []
    for j in range(n_right):
        k = rng.randrange(n_keys)
        t = EPOCH + dt.timedelta(seconds=rng.randrange(100_000))
        if unique_right and (k, t) in seen:
            continue
        seen.add((k, t))
        right.append((1000 + j, k, t, round(rng.uniform(0, 100), 3)))
    return left, right


def _pandas_asof(left, right, direction, strict, tolerance_s=None):
    lp = pd.DataFrame(left, columns=["lid", "k", "ts", "lv"]).sort_values("ts")
    if not right:
        return {int(r.lid): None for r in lp.itertuples()}
    rp = pd.DataFrame(right, columns=["rid", "k", "ts", "rv"]).sort_values(
        ["ts", "rid"]
    )
    out = pd.merge_asof(
        lp,
        rp.rename(columns={"ts": "rts"}),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=not strict,
        tolerance=(
            pd.Timedelta(seconds=tolerance_s) if tolerance_s else None
        ),
    )
    return {
        int(r.lid): (None if pd.isnull(r.rts) else (r.rts, round(r.rv, 3)))
        for r in out.itertuples()
    }


def _spark_asof(spark, left, right, **kw):
    l_df = spark.createDataFrame(
        left, "lid long, k long, ts timestamp, lv double"
    )
    r_df = spark.createDataFrame(
        right, "rid long, k long, ts timestamp, rv double"
    )
    res = asof_join(
        l_df, r_df, on=["k"], left_ts="ts", right_cols=["rv"], **kw
    ).collect()
    return {
        int(r.lid): (
            None if r.asof_ts is None else (r.asof_ts, round(r.asof_rv, 3))
        )
        for r in res
    }


@pytest.mark.parametrize(
    "direction,strict",
    [("backward", False), ("backward", True), ("forward", False)],
)
def test_asof_matches_pandas(spark, direction, strict):
    left, right = _rand_frames(seed=7)
    got = _spark_asof(spark, left, right, direction=direction, strict=strict)
    want = _pandas_asof(left, right, direction, strict)
    assert got == want
    assert any(v is not None for v in got.values())


def test_asof_tolerance(spark):
    left, right = _rand_frames(seed=11)
    got = _spark_asof(
        spark, left, right, direction="backward", tolerance_s=600
    )
    want = _pandas_asof(left, right, "backward", False, tolerance_s=600)
    assert got == want
    # the horizon must actually null something out vs the unbounded run
    unbounded = _pandas_asof(left, right, "backward", False)
    assert sum(v is None for v in want.values()) > sum(
        v is None for v in unbounded.values()
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_chunked_equals_plain(spark, direction):
    # mega-key skew shape: 80% of rows on one key
    left, right = _rand_frames(seed=13, n_keys=2, n_left=400, n_right=300)
    plain = _spark_asof(spark, left, right, direction=direction)
    chunked = _spark_asof(
        spark, left, right, direction=direction, chunk_s=3600
    )
    assert plain == chunked


def test_asof_no_right_rows_for_key(spark):
    left = [(0, 0, EPOCH + dt.timedelta(seconds=10), 1.0)]
    right = [(100, 1, EPOCH, 2.0)]  # different key only
    got = _spark_asof(spark, left, right)
    assert got == {0: None}


def test_range_join_matches_bruteforce(spark):
    rng = random.Random(3)
    ivs = [
        (
            j,
            rng.randrange(4),
            EPOCH + dt.timedelta(seconds=(s := rng.randrange(50_000))),
            EPOCH + dt.timedelta(seconds=s + rng.randrange(1, 7200)),
        )
        for j in range(60)
    ]
    pts = [
        (
            i,
            rng.randrange(4),
            EPOCH + dt.timedelta(seconds=rng.randrange(55_000)),
        )
        for i in range(500)
    ]
    ivs_df = _mk(spark, ivs, ["iid", "k", "start_ts", "end_ts"])
    pts_df = _mk(spark, pts, ["pid", "k", "ts"])
    got = {
        (r.iid, r.pid)
        for r in point_in_interval_join(
            pts_df, ivs_df, on=["k"], bucket_s=1800
        ).collect()
    }
    want = {
        (j, i)
        for (j, k, s, e) in ivs
        for (i, pk, t) in pts
        if pk == k and s <= t < e
    }
    assert got == want
    assert len(want) > 0


def test_range_join_span_guard(spark):
    ivs = [(0, 0, EPOCH, EPOCH + dt.timedelta(seconds=10_000))]
    pts = [(0, 0, EPOCH + dt.timedelta(seconds=5))]
    ivs_df = _mk(spark, ivs, ["iid", "k", "start_ts", "end_ts"])
    pts_df = _mk(spark, pts, ["pid", "k", "ts"])
    with pytest.raises(Exception, match="spans"):
        point_in_interval_join(
            pts_df, ivs_df, on=["k"], bucket_s=60, max_buckets=8
        ).collect()


def test_asof_and_range_join_plans_have_no_nested_loop(spark, sf_dir):
    """Both temporal joins must plan as shuffle/window or equi-join —
    a naive inequality translation would be a BroadcastNestedLoopJoin
    (per-row full scan of the other side, dead at 100 TB)."""
    from unarxive_spark.plans.tabular_queries import q_asof_join, q_range_join

    for q in (q_asof_join, q_range_join):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__


# ---------------------------------------------------------------------
# Property-based: hypothesis-generated event streams vs pandas.merge_asof
# (duplicate left timestamps, empty keys, clustered times all arise)
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

asof_cases = st.tuples(
    st.lists(  # left: (key, seconds) — duplicates allowed
        st.tuples(st.integers(0, 3), st.integers(0, 5000)),
        min_size=1,
        max_size=25,
    ),
    st.lists(  # right
        st.tuples(st.integers(0, 3), st.integers(0, 5000)),
        min_size=0,
        max_size=25,
    ),
    st.sampled_from(["backward", "forward"]),
    st.booleans(),  # strict
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_cases)
def test_asof_property(spark, case):
    lrows, rrows, direction, strict = case
    left = [
        (i, k, EPOCH + dt.timedelta(seconds=s), float(i))
        for i, (k, s) in enumerate(lrows)
    ]
    # unique right (k, ts): merge_asof tie-break among equal right ts is
    # positional, the engine's is value-deterministic — dedup to compare
    seen, right = set(), []
    for j, (k, s) in enumerate(rrows):
        if (k, s) in seen:
            continue
        seen.add((k, s))
        right.append((1000 + j, k, EPOCH + dt.timedelta(seconds=s), float(j)))
    got = _spark_asof(spark, left, right, direction=direction, strict=strict)
    want = _pandas_asof(left, right, direction, strict)
    assert got == want


def test_asof_null_timestamps(spark):
    # NULL-ts right rows must never match; NULL-ts left rows come back
    # unmatched (left-join semantics)
    left = [
        (0, 0, EPOCH + dt.timedelta(seconds=100), 1.0),
        (1, 0, None, 1.0),
    ]
    right = [
        (100, 0, None, 9.0),  # must not be served as a match
        (101, 0, EPOCH + dt.timedelta(seconds=50), 7.0),
    ]
    got = _spark_asof(spark, left, right)
    assert got[0] == (EPOCH + dt.timedelta(seconds=50), 7.0)
    assert got[1] is None


def test_range_join_null_bounded_intervals_excluded(spark):
    # A NULL start/end can never satisfy start <= ts < end; it must be
    # dropped under inner-join semantics, not crash the job via a NULL
    # assert_true condition in the span guard (ADVICE r3).
    ivs = [
        (0, 0, EPOCH, EPOCH + dt.timedelta(seconds=1800)),
        (1, 0, None, EPOCH + dt.timedelta(seconds=1800)),
        (2, 0, EPOCH, None),
        (3, 0, None, None),
    ]
    pts = [(0, 0, EPOCH + dt.timedelta(seconds=600))]
    ivs_df = _mk(spark, ivs, ["iid", "k", "start_ts", "end_ts"])
    pts_df = _mk(spark, pts, ["pid", "k", "ts"])
    got = {
        (r.iid, r.pid)
        for r in point_in_interval_join(
            pts_df, ivs_df, on=["k"], bucket_s=900
        ).collect()
    }
    assert got == {(0, 0)}


def test_range_join_keyless_band(spark):
    # on=[] makes it a pure time-band join (bucket-only candidates)
    ivs = [
        (0, EPOCH, EPOCH + dt.timedelta(seconds=1800)),
        (1, EPOCH + dt.timedelta(seconds=900), EPOCH + dt.timedelta(seconds=2700)),
    ]
    pts = [(i, EPOCH + dt.timedelta(seconds=600 * i)) for i in range(6)]
    ivs_df = _mk(spark, ivs, ["iid", "start_ts", "end_ts"])
    pts_df = _mk(spark, pts, ["pid", "ts"])
    got = {
        (r.iid, r.pid)
        for r in point_in_interval_join(
            pts_df, ivs_df, on=[], bucket_s=900
        ).collect()
    }
    want = {
        (j, i)
        for (j, s, e) in ivs
        for (i, t) in pts
        if s <= t < e
    }
    assert got == want and len(want) > 0
