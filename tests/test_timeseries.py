"""Planted-fixture tests for operators/timeseries.py (q122/q124
machinery) and operators/itemsets.py (q121): CUSUM window identity vs
the textbook recursion, EWMA power-of-two weights vs a python replay,
and association-rule counts/ratios vs brute force."""

import pytest
from pyspark.sql import functions as F

from unarxive_spark.operators.itemsets import association_rules
from unarxive_spark.operators.timeseries import cusum_drift, ewma_smooth


def _ev(spark, rows):
    # (user_id, event_id, ts_offset_s, value)
    return spark.createDataFrame(
        [(u, e, f"2024-01-01 00:00:{t:02d}", v) for u, e, t, v in rows],
        "user_id long, event_id long, ts_s string, value double",
    ).select(
        "user_id",
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )


def _cusum_replay(values, k_e6, h_e6):
    """Textbook recursion S_t = max(0, S_{t-1} + x_t - k)."""
    s, out = 0, []
    for v in values:
        s = max(0, s + round(v * 1e6) - k_e6)
        out.append(s)
    drifts = [i + 1 for i, s in enumerate(out) if s > h_e6]
    return (
        len(values),
        max(out),
        len(drifts),
        drifts[0] if drifts else None,
    )


def test_cusum_matches_textbook_recursion(spark):
    vals = [10.0, 90.0, 80.0, 5.0, 70.0, 75.0, 72.0, 1.0]
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    got = cusum_drift(
        _ev(spark, rows), k_e6=60_000_000, h_e6=20_000_000
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (
        r.n_events,
        r.max_cusum_e6,
        r.n_drift_events,
        r.first_drift_rn,
    ) == _cusum_replay(vals, 60_000_000, 20_000_000)


def test_cusum_no_drift_is_null(spark):
    rows = [(7, i, i, 1.0) for i in range(5)]
    r = cusum_drift(
        _ev(spark, rows), k_e6=60_000_000, h_e6=10**12
    ).collect()[0]
    assert r.n_drift_events == 0 and r.first_drift_rn is None


def _ewma_replay(values, window):
    """Windowed alpha=1/2 EWMA: weight 2^(i-1) (oldest i=0 gets 1)."""
    xs = [round(v * 1e6) for v in values]
    out = []
    for t in range(len(xs)):
        lo = max(0, t - window + 1)
        win = xs[lo : t + 1]
        num = sum(
            x * (1 if i == 0 else 2 ** (i - 1)) for i, x in enumerate(win)
        )
        den = 2 ** (len(win) - 1)
        out.append((num, den, (2 * num + den) // (2 * den)))
    return out


def test_ewma_matches_python_replay(spark):
    vals = [10.0, 20.0, 40.0, 80.0, 160.0, 5.0]
    rows = [(1, i, i, v) for i, v in enumerate(vals)]
    got = sorted(
        ewma_smooth(_ev(spark, rows), window=4).collect(),
        key=lambda r: r.rn,
    )
    want = _ewma_replay(vals, 4)
    assert [(r.ewma_num, r.ewma_den, r.ewma_e6) for r in got] == want
    # newest element always carries half the total weight
    assert got[3].ewma_num == (
        round(80.0 * 1e6) * 4
        + round(40.0 * 1e6) * 2
        + round(20.0 * 1e6) * 1
        + round(10.0 * 1e6) * 1
    )


def test_ewma_anomaly_flag_is_exact_cross_multiply(spark):
    # second value jumps by 100 > t=50 vs prev ewma (= first value)
    rows = [(1, 0, 0, 10.0), (1, 1, 1, 115.0), (1, 2, 2, 120.0)]
    got = {
        r.rn: r.is_anomaly
        for r in ewma_smooth(
            _ev(spark, rows), window=4, anomaly_t_e6=50_000_000
        ).collect()
    }
    # first row: no previous ewma -> false; second: |115-10| > 50;
    # third: prev ewma = (10+2*115)/4 = 60, |120-60| > 50
    assert got == {1: False, 2: True, 3: True}


def test_ewma_rejects_degenerate_window(spark):
    with pytest.raises(ValueError):
        ewma_smooth(_ev(spark, [(1, 0, 0, 1.0)]), window=1)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket_id long, item_id long")


def test_association_rules_counts_and_ratios(spark):
    # items 1,2 co-occur in 2 of 4 baskets; item 9 infrequent (1 basket)
    rows = [
        (100, 1),
        (100, 2),
        (100, 9),
        (200, 1),
        (200, 2),
        (300, 1),
        (400, 2),
    ]
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            _baskets(spark, rows),
            min_item_support=2,
            min_pair_support=2,
        ).collect()
    }
    assert set(got) == {(1, 2), (2, 1)}
    r12 = got[(1, 2)]
    assert r12.support_cnt == 2 and r12.antecedent_cnt == 3
    assert r12.confidence == round(2 / 3, 6)
    # lift = P(1,2)/P(1)P(2) = (2/4) / ((3/4)*(3/4))
    assert r12.lift == round(2 * 4 / (3 * 3), 6)
    assert got[(2, 1)].antecedent_cnt == 3


def test_association_rules_apriori_prunes_infrequent_items(spark):
    # pair (1,9) co-occurs twice but 9 is below item support -> pruned
    rows = [(100, 1), (100, 9), (200, 1), (200, 9), (300, 1)]
    got = association_rules(
        _baskets(spark, rows), min_item_support=3, min_pair_support=2
    ).collect()
    assert got == []


def test_association_rules_dedups_repeated_lines(spark):
    # the same (basket, item) twice must count once (DISTINCT baskets)
    rows = [(100, 1), (100, 1), (100, 2), (200, 1), (200, 2)]
    got = {
        (r.antecedent, r.consequent): r.support_cnt
        for r in association_rules(
            _baskets(spark, rows),
            min_item_support=1,
            min_pair_support=2,
        ).collect()
    }
    assert got == {(1, 2): 2, (2, 1): 2}


def test_ewma_rejects_negative_values(spark):
    """r5 ADVICE: the half-up integer identity assumes num >= 0 —
    negative inputs must fail loudly, not silently mis-round."""
    ev = _ev(spark, [(1, 1, 1, 2.0), (1, 2, 2, -0.5)])
    with pytest.raises(Exception, match="non-negative"):
        ewma_smooth(ev).collect()
