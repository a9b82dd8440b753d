"""LinkGraph — the engine's user-facing facade.

One object wraps the (vertices, edges) pair and exposes every analytics
operator, so a user of the reference's pipeline scripts drives the whole
engine from a handful of calls:

    from unarxive_spark import get_spark
    from unarxive_spark.graph import LinkGraph

    g = LinkGraph.from_transcripts(spark.read.table("transcripts"))
    g.pagerank().ranks.show()
    g.connected_components().components.show()
    g.top_cited(10).show()
    g.persist_bucketed("edges_bucketed")
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from unarxive_spark.operators import degrees as _deg
from unarxive_spark.operators.components import (
    ComponentsResult,
    connected_components,
)
from unarxive_spark.operators.edges import (
    build_edges,
    edge_resolution_metrics,
    enrich_edges,
    repartition_by_src,
)
from unarxive_spark.operators.lpa import LPAResult, label_propagation
from unarxive_spark.operators.pagerank import PageRankResult, pagerank
from unarxive_spark.operators.stats import (
    build_vertices,
    category_month_cube,
    group_rollup,
    link_rate_by_group,
)
from unarxive_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
)


class LinkGraph:
    """Directed weighted conversation graph + attribute table."""

    def __init__(
        self, edges: DataFrame, vertices: DataFrame | None = None
    ):
        self.edges = edges
        self.vertices = vertices

    # -- construction ---------------------------------------------------

    @classmethod
    def from_transcripts(
        cls, transcripts: DataFrame, resolve: bool = True
    ) -> "LinkGraph":
        """L1+L2 in one step: mine refs, resolve, weight, attach the
        per-conversation attribute table."""
        return cls(
            build_edges(transcripts, resolve=resolve),
            build_vertices(transcripts),
        )

    def cache(self) -> "LinkGraph":
        self.edges = repartition_by_src(self.edges).cache()
        if self.vertices is not None:
            self.vertices = self.vertices.cache()
        return self

    # -- analytics (L3) ---------------------------------------------------

    def pagerank(self, **kw) -> PageRankResult:
        return pagerank(self.edges, **kw)

    def connected_components(self, **kw) -> ComponentsResult:
        return connected_components(self.edges, **kw)

    def label_propagation(self, **kw) -> LPAResult:
        return label_propagation(self.edges, **kw)

    def triangle_count(self) -> int:
        return triangle_count(self.edges)

    def triangles_per_vertex(self) -> DataFrame:
        return triangles_per_vertex(self.edges)

    def strongly_connected_components(self, **kw):
        from unarxive_spark.operators.scc import (
            strongly_connected_components,
        )

        return strongly_connected_components(self.edges, **kw)

    def bfs(self, sources: list[str], max_hops: int = 20) -> DataFrame:
        from unarxive_spark.operators.bfs import bfs_distances

        return bfs_distances(self.edges, sources, max_hops)

    def shortest_paths(self, source: str, **kw) -> DataFrame:
        from unarxive_spark.operators.sssp import shortest_paths

        return shortest_paths(self.edges, source, **kw)

    def modularity(self, labels: DataFrame) -> float:
        from unarxive_spark.operators.modularity import modularity

        return modularity(self.edges, labels)

    def hits(self, **kw):
        from unarxive_spark.operators.hits import hits

        return hits(self.edges, **kw)

    def k_core(self, k: int, **kw) -> DataFrame:
        from unarxive_spark.operators.kcore import k_core

        return k_core(self.edges, k, **kw)

    def core_numbers(self, **kw) -> DataFrame:
        from unarxive_spark.operators.kcore import core_numbers

        return core_numbers(self.edges, **kw)

    def betweenness(self, **kw) -> DataFrame:
        from unarxive_spark.operators.betweenness import betweenness

        return betweenness(self.edges, **kw)

    def maximal_independent_set(self, **kw) -> DataFrame:
        from unarxive_spark.operators.mis import maximal_independent_set

        return maximal_independent_set(self.edges, **kw)

    def greedy_coloring(self, **kw) -> DataFrame:
        from unarxive_spark.operators.mis import greedy_coloring

        return greedy_coloring(self.edges, **kw)

    def k_truss(self, k: int, **kw) -> DataFrame:
        from unarxive_spark.operators.ktruss import k_truss

        return k_truss(self.edges, k, **kw)

    def anf(self, **kw):
        """Reachable-set sketches (ANF/HyperBall); pair with
        ``anf_estimates`` / ``effective_diameter`` from operators.anf."""
        from unarxive_spark.operators.anf import anf

        return anf(self.edges, **kw)

    def co_citation(self, **kw) -> DataFrame:
        from unarxive_spark.operators.cocitation import co_citation

        return co_citation(self.edges, **kw)

    def bibliographic_coupling(self, **kw) -> DataFrame:
        from unarxive_spark.operators.cocitation import (
            bibliographic_coupling,
        )

        return bibliographic_coupling(self.edges, **kw)

    def neighbor_jaccard(self, **kw) -> DataFrame:
        from unarxive_spark.operators.cocitation import neighbor_jaccard

        return neighbor_jaccard(self.edges, **kw)

    def random_walks(self, starts: DataFrame, **kw) -> DataFrame:
        from unarxive_spark.operators.walks import random_walks

        return random_walks(self.edges, starts, **kw)

    def degrees(self) -> DataFrame:
        return _deg.degrees(self.edges)

    def top_cited(self, k: int = 10) -> DataFrame:
        return _deg.top_cited(self.edges, k)

    # -- reporting (L4) ---------------------------------------------------

    def enriched_edges(self) -> DataFrame:
        if self.vertices is None:
            raise ValueError("vertices required; use from_transcripts")
        return enrich_edges(self.edges, self.vertices)

    def category_month_cube(self, full: bool = False) -> DataFrame:
        if full:
            from unarxive_spark.operators.stats import (
                category_month_cube_full,
            )

            return category_month_cube_full(self._require_vertices())
        return category_month_cube(self._require_vertices())

    def group_rollup(self) -> DataFrame:
        return group_rollup(self._require_vertices())

    def taxonomy_rollup(self) -> DataFrame:
        from unarxive_spark.operators.stats import taxonomy_rollup

        return taxonomy_rollup(self._require_vertices())

    def link_rate_by_group(self) -> DataFrame:
        return link_rate_by_group(self._require_vertices())

    def link_rate_by_day(self) -> DataFrame:
        from unarxive_spark.operators.stats import link_rate_by_day

        return link_rate_by_day(self._require_vertices())

    @staticmethod
    def resolution_metrics(transcripts: DataFrame) -> DataFrame:
        return edge_resolution_metrics(transcripts)

    # -- persistence ------------------------------------------------------

    def persist_bucketed(
        self, table: str = "edges_bucketed", n_buckets: int = 32
    ) -> None:
        from unarxive_spark.sources.tables import write_edges_bucketed

        write_edges_bucketed(self.edges, table, n_buckets)

    def _require_vertices(self) -> DataFrame:
        if self.vertices is None:
            raise ValueError("vertices required; use from_transcripts")
        return self.vertices
