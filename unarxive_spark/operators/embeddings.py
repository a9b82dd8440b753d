"""DeepWalk/node2vec vertex embeddings — the end of the walk pipeline.

Perozzi, Al-Rfou, Skiena "DeepWalk" (KDD 2014) / Grover & Leskovec
"node2vec" (KDD 2016): truncated random walks are sentences; skip-gram
over them embeds vertices so that graph proximity becomes cosine
proximity.  This operator closes the loop the walk corpus
(``operators/walks.py``) exists for: edges → deterministic walks →
skip-gram (Spark ML ``Word2Vec``, JVM-side) → an ``embeddings``-shaped
table (vertex, array<float>) that feeds straight into the ANN /
cosine-dedup operators (``operators/similarity.py``).

Verification note: Word2Vec training is floating-point and
internally parallel — per-run deterministic under a fixed seed +
``numPartitions=1``, but NOT bit-stable across engines, so there is no
DuckDB oracle here (the driver gate covers every upstream stage: walks
q52/q72/q73, corpus grouping, ANN q34/q53/q54).  The pytest asserts the
STRUCTURAL property instead: planted communities embed closer together
than across.

100-TB shape: the expensive parts are the walk supersteps (each one
frontier⋈adjacency join — the PageRank dataflow) and skip-gram itself
(Spark ML distributes by sentence partition); the corpus is
|V|·walks_per_vertex rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.operators.walks import (
    node2vec_walks,
    random_walks,
    walk_corpus,
)

__all__ = ["deepwalk_embeddings"]


def deepwalk_embeddings(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 5,
    dim: int = 16,
    window: int = 4,
    seed: int = 42,
    weight_col: str | None = None,
    node2vec_biases: tuple[int, int, int] | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """edges → (conv_id, embedding array<float>).

    ``node2vec_biases = (ret, adj, far)`` switches the corpus to
    second-order biased walks; ``num_partitions=1`` keeps training
    deterministic for a fixed seed (raise it on a cluster — the
    standard determinism/throughput trade of parallel SGD).
    """
    from pyspark.ml.feature import Word2Vec

    starts = (
        edges.select(F.col("src_conv_id").alias("conv_id"))
        .unionByName(edges.select(F.col("dst_conv_id").alias("conv_id")))
        .distinct()
    )
    if node2vec_biases is not None:
        ret, adj, far = node2vec_biases
        walks = node2vec_walks(
            edges,
            starts,
            walk_length=walk_length,
            walks_per_vertex=walks_per_vertex,
            seed=seed,
            ret_bias=ret,
            adj_bias=adj,
            far_bias=far,
            weight_col=weight_col,
        )
    else:
        walks = random_walks(
            edges,
            starts,
            walk_length=walk_length,
            walks_per_vertex=walks_per_vertex,
            seed=seed,
            weight_col=weight_col,
        )
    corpus = walk_corpus(walks)
    model = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=0,
        seed=seed,
        numPartitions=num_partitions,
        inputCol="sentence",
        outputCol="__vec",
    ).fit(corpus)
    from pyspark.ml.functions import vector_to_array

    return model.getVectors().select(
        F.col("word").alias("conv_id"),
        vector_to_array("vector", "float32").alias("embedding"),
    )
