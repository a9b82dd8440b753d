"""Temporal reachability vs a pure-Python earliest-arrival replay."""

import pytest

from unarxive_spark.operators.temporal import (
    temporal_edges_from_events,
    temporal_reachability,
)

EDGE_SCHEMA = "src string, dst string, et long"


def _replay(edges, source):
    """Label-correcting earliest arrival over (src, dst, et)."""
    reach = {source: 0}
    changed = True
    while changed:
        changed = False
        for s, d, t in edges:
            if s == d:
                continue
            if s in reach and t >= reach[s]:
                if d not in reach or t < reach[d]:
                    reach[d] = t
                    changed = True
    return reach


def test_temporal_reachability_respects_time(spark):
    """b→c exists structurally but its edge (t=5) predates every
    arrival at b (t=10), so c must stay unreached via that path; the
    later b→d edge (t=20) works."""
    edges = [
        ("a", "b", 10),
        ("b", "c", 5),   # too early: unusable
        ("b", "d", 20),
        ("d", "c", 30),  # c reachable the long way at t=30
        ("x", "a", 99),  # into the source: irrelevant
    ]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    got = {
        r["conv_id"]: r["reach_us"]
        for r in temporal_reachability(df, "a", max_rounds=10).collect()
    }
    assert got == _replay(edges, "a")
    assert got == {"a": 0, "b": 10, "d": 20, "c": 30}


def test_temporal_reachability_prefers_earliest(spark):
    """Two temporal paths to z: the earlier arrival must win, and a
    later parallel edge must not overwrite it."""
    edges = [
        ("a", "z", 50),
        ("a", "b", 10),
        ("b", "z", 15),
        ("a", "z", 70),
    ]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    got = {
        r["conv_id"]: r["reach_us"]
        for r in temporal_reachability(df, "a", max_rounds=10).collect()
    }
    assert got == _replay(edges, "a")
    assert got["z"] == 15


def test_temporal_reachability_strict_raises(spark):
    """A 3-hop chain cannot converge in 1 round under strict mode
    (round 1 still improves at the bound)."""
    edges = [("a", "b", 1), ("b", "c", 2), ("c", "d", 3)]
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    with pytest.raises(RuntimeError, match="still improving"):
        temporal_reachability(df, "a", max_rounds=1)


def test_temporal_edges_from_events_resolution(spark, sf_dir):
    """Edge stream replayed row-by-row from the raw events parquet."""
    import re

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.collect()
    users = {r["user_id"] for r in rows}
    want = set()
    for r in rows:
        m = re.search("[0-9]+", r["props"] or "")
        k = int(m.group(0)) if m else 0
        dst = (r["user_id"] * 7 + k) % 200
        if dst != r["user_id"] and dst in users:
            # session tz is UTC: interpret the naive ts as UTC
            import datetime as _dt

            et = int(
                r["ts"].replace(tzinfo=_dt.timezone.utc).timestamp()
                * 1_000_000
            )
            want.add((f"c{r['user_id']:06d}", f"c{dst:06d}", et))
    got = {
        (r["src"], r["dst"], r["et"])
        for r in temporal_edges_from_events(ev).collect()
    }
    assert got == want


def test_temporal_reachability_on_events_graph(spark, sf_dir):
    """End-to-end on the events-derived stream vs the replay."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    te = temporal_edges_from_events(ev)
    edges = [(r["src"], r["dst"], r["et"]) for r in te.collect()]
    got = {
        r["conv_id"]: r["reach_us"]
        for r in temporal_reachability(
            te, "c000000", max_rounds=20
        ).collect()
    }
    assert got == _replay(edges, "c000000")
    assert got["c000000"] == 0
    assert len(got) > 1
