"""Planted-fixture tests for operators/intervals.py (q111/q112
machinery): sweep-line concurrency vs a brute-force python sweep,
half-open touch semantics, cross-hour offset correctness, and SCD2
run-length history."""

import datetime as dt

from pyspark.sql import functions as F

from unarxive_spark.operators.intervals import (
    daily_max_concurrency,
    interval_concurrency,
    session_intervals,
    state_history,
)

_US = 1_000_000
_HOUR = 3600 * _US


def _iv(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, session_id long, start_us long, end_us long"
    )


def _brute_concurrency(rows):
    """Python sweep with the engine's exact tie order."""
    bps = []
    for u, s, a, b in rows:
        bps.append((a, 1, u, s))
        bps.append((b, -1, u, s))
    bps.sort()
    out, run = {}, 0
    for us, delta, u, s in bps:
        run += delta
        out[(us, delta, u, s)] = run
    return out


def test_sweep_matches_brute_force_across_hours(spark):
    rows = [
        # nested triple inside hour 0
        (1, 1, 10, 100),
        (2, 1, 20, 90),
        (3, 1, 30, 40),
        # spans three hour buckets: offsets must carry it across
        (4, 1, 50, 2 * _HOUR + 500),
        # entirely inside hour 2
        (5, 1, 2 * _HOUR + 100, 2 * _HOUR + 200),
    ]
    got = {
        (r.us, r.delta, r.user_id, r.session_id): r.concurrency
        for r in interval_concurrency(_iv(spark, rows)).collect()
    }
    assert got == _brute_concurrency(rows)
    # while the long interval is open, hour-2 concurrency includes it
    assert got[(2 * _HOUR + 100, 1, 5, 1)] == 2


def test_half_open_touch_is_not_concurrent(spark):
    rows = [(1, 1, 0, 100), (2, 1, 100, 200)]
    got = {
        (r.us, r.delta): r.concurrency
        for r in interval_concurrency(_iv(spark, rows)).collect()
    }
    # at us=100 the end (-1) applies before the start (+1): never 2 open
    assert got[(100, -1)] == 0
    assert got[(100, 1)] == 1


def test_daily_max_picks_earliest_attaining_breakpoint(spark):
    day0 = 0
    rows = [
        (1, 1, day0 + 10, day0 + 100),
        (2, 1, day0 + 20, day0 + 100),  # peak 2 first attained at us=20
        (3, 1, day0 + 50, day0 + 60),   # peak 3 attained at us=50
    ]
    out = daily_max_concurrency(
        interval_concurrency(_iv(spark, rows))
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.day == "1970-01-01"
    assert row.max_concurrent == 3
    assert row.at_us == day0 + 50
    assert row.n_breakpoints == 6


def test_session_intervals_gap_rule(spark):
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, base, 10),
            (1, base + dt.timedelta(minutes=10), 11),
            (1, base + dt.timedelta(minutes=50), 12),  # >30min: new session
            (2, base, 20),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    iv = {
        (r.user_id, r.session_id): (r.start_us, r.end_us, r.n_events)
        for r in session_intervals(ev).collect()
    }
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * _US
    assert iv[(1, 1)] == (t0, t0 + 600 * _US + _US, 2)
    assert iv[(1, 2)] == (t0 + 3000 * _US, t0 + 3000 * _US + _US, 1)
    assert iv[(2, 1)] == (t0, t0 + _US, 1)


def test_state_history_runs_and_validity(spark):
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, "view", base, 1),
            (1, "view", base + dt.timedelta(seconds=1), 2),
            (1, "click", base + dt.timedelta(seconds=2), 3),
            (1, "view", base + dt.timedelta(seconds=3), 4),
            (2, "error", base, 5),
        ],
        "user_id long, event_type string, ts timestamp, event_id long",
    )
    hist = {
        (r.user_id, r.version): r
        for r in state_history(ev).collect()
    }
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * _US
    # user 1: view(x2) -> click -> view = 3 versions
    assert [hist[(1, v)].state for v in (1, 2, 3)] == [
        "view", "click", "view"
    ]
    assert hist[(1, 1)].n_events == 2
    assert hist[(1, 1)].valid_from_us == t0
    assert hist[(1, 1)].valid_to_us == t0 + 2 * _US
    assert hist[(1, 3)].valid_to_us is None
    assert hist[(1, 3)].is_current == 1
    assert hist[(1, 1)].is_current == 0
    assert hist[(2, 1)].state == "error"
    assert hist[(2, 1)].is_current == 1


def test_interval_plans_have_no_quadratic_or_python_nodes(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bp = interval_concurrency(session_intervals(ev))
    for df in (bp, daily_max_concurrency(bp), state_history(ev)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
