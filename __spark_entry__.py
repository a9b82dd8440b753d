"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (events → transcripts → edge mining
→ PageRank) at sf0.001. ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY.md §2 with a DuckDB oracle; graph
queries derive the transcripts table deterministically from ``events``
in BOTH engines so even PageRank/CC/triangles are value-checked.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcript-derived citation graph → PageRank top-20."""
    from pyspark.sql import functions as F

    from unarxive_spark.operators.edges import build_edges
    from unarxive_spark.operators.pagerank import pagerank
    from unarxive_spark.plans.driver_queries import transcripts_from_events

    t = transcripts_from_events(spark, "/root/testdata/sf0.001")
    edges = build_edges(t)
    res = pagerank(edges, tol=1e-8, max_iter=60)
    return res.ranks.orderBy(F.desc("rank"), F.asc("conv_id")).limit(20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from unarxive_spark.plans.driver_queries import GRAPH_QUERIES
    from unarxive_spark.plans.tabular_queries import TABULAR_QUERIES

    return {**GRAPH_QUERIES, **TABULAR_QUERIES}


def oracle_sql() -> dict[str, str]:
    from unarxive_spark.plans.driver_queries import GRAPH_ORACLES
    from unarxive_spark.plans.tabular_queries import TABULAR_ORACLES

    return {**GRAPH_ORACLES, **TABULAR_ORACLES}
