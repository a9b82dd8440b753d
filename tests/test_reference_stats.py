"""Reference-statistics mirror (SURVEY.md §5 item 1: 'statistical
verification as acceptance test').

The reference's headline numbers (/root/reference/README.md:27-32):
63 M raw references, 28 M linked (≈44%) — i.e. refmatch_rate ≈ 0.44
(/root/reference/src/utility_scripts/calc_stats.py:25-39). The synthetic
generator reproduces that regime when configured with the reference's
unlinked share, and the engine's metrics recover it.
"""

from unarxive_spark.datagen import synth_transcripts
from unarxive_spark.operators.edges import edge_resolution_metrics


def test_refmatch_rate_mirrors_reference(spark):
    # unarXive: 28/63 ≈ 0.444 linked. unresolved_pct=56 → designed
    # link rate ≈ 0.44 (self-loop drops shift it by <1%).
    t = synth_transcripts(spark, n_convs=400, seed=42, unresolved_pct=56)
    m = edge_resolution_metrics(t).collect()[0]
    assert m["n_refs"] > 1000
    assert abs(m["link_rate"] - 28 / 63) < 0.03, m["link_rate"]


def test_marker_weighting_matches_calc_stats_semantics(spark):
    """Edge weight = number of in-text markers (calc_stats.py:213-223
    counts every occurrence, not distinct refs): total edge weight must
    equal the resolved marker count exactly."""
    from pyspark.sql import functions as F

    from unarxive_spark.operators.edges import build_edges

    t = synth_transcripts(spark, n_convs=150, seed=3)
    e = build_edges(t)
    total_weight = e.agg(F.sum("weight")).collect()[0][0]
    m = edge_resolution_metrics(t).collect()[0]
    assert total_weight == m["n_refs_linked"]
