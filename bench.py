"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "scaling": {"cores_n": 8, "cores_4n": 32,
               "edges_per_sec_n": ..., "edges_per_sec_4n": ...,
               "supersteps_per_sec_n": ..., "supersteps_per_sec_4n": ...,
               "efficiency": ...}}

Two parts:
1. Headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
   local[$SPARK_GRAFT_CPUS]: edge build, PageRank-to-convergence,
   connected components, pricing agg, minhash dedup, cosine top-k.
2. Scaling run (BASELINE.json north rule: throughput efficiency >= 0.8
   from N to 4N executors, evidenced here as local[8] vs local[32]):
   the identical fixed-superstep PageRank job on the identical synthetic
   edge table at both parallelism levels; efficiency =
   (tput_4N / tput_N) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unarxive_spark.session import get_spark, stop_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "60000"))
SCALE_ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "5"))


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, time.monotonic() - t0


def headline_queries(spark) -> dict[str, float]:
    from pyspark.sql import functions as F

    from unarxive_spark.operators.components import connected_components
    from unarxive_spark.operators.edges import build_edges
    from unarxive_spark.operators.pagerank import pagerank
    from unarxive_spark.plans.driver_queries import transcripts_from_events
    from unarxive_spark.plans.tabular_queries import (
        q_cosine_topk,
        q_minhash,
        q_pricing_summary,
    )

    times: dict[str, float] = {}

    t = transcripts_from_events(spark, SF_DIR)
    edges, times["edge_build"] = _timed(
        lambda: build_edges(t).cache()
    )
    n_edges, dt = _timed(edges.count)
    times["edge_build"] += dt

    _, times["pagerank"] = _timed(
        lambda: pagerank(edges, tol=1e-6, max_iter=50).ranks.count()
    )
    _, times["components"] = _timed(
        lambda: connected_components(edges).components.count()
    )
    _, times["pricing_summary"] = _timed(
        lambda: q_pricing_summary(spark, SF_DIR).count()
    )
    _, times["minhash"] = _timed(lambda: q_minhash(spark, SF_DIR).count())
    _, times["cosine_topk"] = _timed(
        lambda: q_cosine_topk(spark, SF_DIR).count()
    )
    edges.unpersist()
    return times


def scaling_run(cores: int) -> dict[str, float]:
    """Fixed-superstep PageRank on the identical seeded synthetic graph."""
    stop_spark()
    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"bench-scaling-{cores}",
        shuffle_partitions=cores * 2,
    )
    from unarxive_spark.datagen import synth_transcripts
    from unarxive_spark.operators.edges import build_edges
    from unarxive_spark.operators.pagerank import pagerank

    t = synth_transcripts(spark, n_convs=BENCH_CONVS, seed=42)
    edges = build_edges(t).cache()
    n_edges = edges.count()

    t0 = time.monotonic()
    pagerank(edges, tol=-1.0, max_iter=SCALE_ITERS).ranks.count()
    dt = time.monotonic() - t0
    stop_spark()
    return {
        "cores": cores,
        "n_edges": n_edges,
        "seconds": dt,
        "supersteps_per_sec": SCALE_ITERS / dt,
        "edges_per_sec": n_edges * SCALE_ITERS / dt,
    }


def main() -> None:
    spark = get_spark(
        master=f"local[{CPUS}]", app_name="bench", shuffle_partitions=CPUS
    )
    times = headline_queries(spark)
    stop_spark()

    lo = scaling_run(8)
    hi = scaling_run(32)
    efficiency = (hi["edges_per_sec"] / lo["edges_per_sec"]) / (
        hi["cores"] / lo["cores"]
    )

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline suite wall time (edge build + PageRank + CC + "
        "reporting + dedup + ANN) at sf" + sf,
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": float(sf),
        "scaling": {
            "cores_n": lo["cores"],
            "cores_4n": hi["cores"],
            "n_edges": hi["n_edges"],
            "pagerank_supersteps": SCALE_ITERS,
            "seconds_n": round(lo["seconds"], 3),
            "seconds_4n": round(hi["seconds"], 3),
            "supersteps_per_sec_n": round(lo["supersteps_per_sec"], 4),
            "supersteps_per_sec_4n": round(hi["supersteps_per_sec"], 4),
            "edges_per_sec_n": round(lo["edges_per_sec"], 1),
            "edges_per_sec_4n": round(hi["edges_per_sec"], 1),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
