"""unarxive_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo (IllDepence/unarXive — a pure-Python citation-graph pipeline) as an
idiomatic Spark DataFrame engine over conversation/agent-transcript tables:

- L1 extraction: mine cross-conversation references (``conv:<id>`` markers)
  from ``text``/``tool`` fields with vectorized Arrow UDFs
  (reference analog: ``parse_latex_tralics.py:106-123`` span extraction,
  ``match_references_openalex.py:22-31`` arXiv-ID sniffing).
- L2 edge build: resolve + weight a directed edge table
  ``(src_conv_id, dst_conv_id, weight)``
  (reference analog: ``match_references_openalex.py`` + ``extend_matched.py``).
- L3 analytics: PageRank, connected components, label propagation,
  triangle counting as join/agg supersteps over hash-partitioned,
  skew-salted adjacency — no GraphX/GraphFrames.
- L4 reporting: calc_stats-style cubes, rollups, ratio-of-sums
  (reference analog: ``utility_scripts/calc_stats.py``).
- Training-data ops: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding-cosine), ANN similarity search, text quality
  scoring, language ID, token counting, fingerprinting, multimodal
  column plumbing.

Design rules (see SURVEY.md):
- DataFrame/SQL only; RDDs never. Catalyst handles pushdown/pruning/codegen.
- Python touches data only through Arrow-batched pandas UDFs.
- Iterative algorithms checkpoint per superstep with a lineage/metrics
  table so runs resume mid-iteration.
"""

__version__ = "0.1.0"

from unarxive_spark.session import get_spark  # noqa: F401
