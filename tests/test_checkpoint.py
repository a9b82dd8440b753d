"""Checkpoint/lineage protocol: resume-equivalence (kill at iteration k,
resume → same converged scores — SURVEY.md §5 invariant tests)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from unarxive_spark.operators.components import connected_components
from unarxive_spark.operators.pagerank import pagerank
from unarxive_spark.sources.checkpoint import CheckpointManager


def test_pagerank_resume_equivalence(edges_small):
    full = pagerank(edges_small, tol=1e-8, max_iter=60)
    assert full.converged
    want = {r["conv_id"]: r["rank"] for r in full.ranks.collect()}

    d = tempfile.mkdtemp(prefix="pr_ckpt_")
    try:
        # simulate a crash: only 3 supersteps commit
        part = pagerank(edges_small, tol=1e-8, max_iter=3, checkpoint_dir=d)
        assert not part.converged and part.iterations == 3

        # resume from lineage; must continue at iteration 3, not restart
        res = pagerank(edges_small, tol=1e-8, max_iter=60, checkpoint_dir=d)
        assert res.converged
        got = {r["conv_id"]: r["rank"] for r in res.ranks.collect()}
        assert set(got) == set(want)
        assert max(abs(got[v] - want[v]) for v in want) < 1e-9

        # resumed run did fewer fresh iterations than the full run
        assert res.iterations == full.iterations

        # lineage table: committed rows for every iteration, metric series
        ck = CheckpointManager(edges_small.sparkSession, d)
        m = ck.metrics().collect()
        iters = [r["iteration"] for r in m]
        assert iters == list(range(full.iterations))
        deltas = [r["metric_value"] for r in m]
        assert deltas[-1] < 1e-8  # converged metric recorded
        assert all(
            a >= b for a, b in zip(deltas[3:], deltas[4:])
        )  # monotone tail
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_components_resume(edges_small):
    d = tempfile.mkdtemp(prefix="cc_ckpt_")
    try:
        part = connected_components(edges_small, max_iter=1, checkpoint_dir=d)
        assert not part.converged
        res = connected_components(edges_small, max_iter=50, checkpoint_dir=d)
        assert res.converged
        fresh = connected_components(edges_small, max_iter=50)
        a = {r["conv_id"]: r["component"] for r in res.components.collect()}
        b = {r["conv_id"]: r["component"] for r in fresh.components.collect()}
        assert a == b
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_lineage_partition_breakdown(edges_small):
    d = tempfile.mkdtemp(prefix="ln_ckpt_")
    try:
        pagerank(edges_small, tol=1e-8, max_iter=2, checkpoint_dir=d)
        ck = CheckpointManager(edges_small.sparkSession, d)
        lin = ck.lineage()
        # per-partition rows present, counts sum to the vertex count
        n_vertices = (
            edges_small.select(F.col("src_conv_id").alias("c"))
            .unionByName(edges_small.select(F.col("dst_conv_id").alias("c")))
            .distinct()
            .count()
        )
        per_iter = (
            lin.filter("status = 'committed'")
            .groupBy("iteration")
            .agg(F.sum("n_rows").alias("n"))
            .collect()
        )
        assert all(r["n"] == n_vertices for r in per_iter)
        assert lin.filter("partition_id IS NOT NULL").count() > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
