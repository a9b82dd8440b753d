"""Co-citation and bibliographic coupling — the two classic
citation-network similarity measures, over the conversation link graph.

- **Co-citation** (Small 1973): conversations A and B are similar when
  the same third conversation cites both → pairs grouped by shared
  citER count.
- **Bibliographic coupling** (Kessler 1963): A and B are similar when
  they cite the same conversations → pairs grouped by shared citED
  count.

These are the standard second-order measures computed over exactly the
edge table unarXive's citation network exists to enable (its JCDL'23
framing, /root/reference/README.md:27-32).

Shape: self-equi-join on the shared endpoint + count — the same
wedge-join pattern as the triangle counter; at scale the join key is the
shared endpoint, so hub conversations fan out quadratically → cap with
``max_degree`` (standard practice: drop mega-hubs from second-order
similarity, they carry no signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _filtered(edges: DataFrame, key: str, max_degree: int | None) -> DataFrame:
    e = edges.select("src_conv_id", "dst_conv_id").distinct()
    if max_degree is None:
        return e
    deg = e.groupBy(key).agg(F.count(F.lit(1)).alias("_d"))
    return (
        e.join(deg.filter(F.col("_d") <= max_degree), key, "left_semi")
    )


def co_citation(
    edges: DataFrame, min_count: int = 1, max_degree: int | None = None
) -> DataFrame:
    """(a, b, n_common_citers) for a < b; hubs capped by out-degree of
    the shared citer when ``max_degree`` is set."""
    e = _filtered(edges, "src_conv_id", max_degree)
    pairs = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.src_conv_id") == F.col("r.src_conv_id"))
            & (F.col("l.dst_conv_id") < F.col("r.dst_conv_id")),
        )
        .groupBy(
            F.col("l.dst_conv_id").alias("a"),
            F.col("r.dst_conv_id").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common_citers"))
    )
    return pairs.filter(F.col("n_common_citers") >= min_count)


def neighbor_jaccard(
    edges: DataFrame,
    min_shared: int = 1,
    max_degree: int | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Link-prediction by neighborhood overlap (undirected):
    ``sim(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)|`` for pairs sharing ≥
    ``min_shared`` neighbors. Pure integer counts + one exact division —
    no transcendental functions, so the score is bit-identical across
    engines (unlike Adamic-Adar's 1/log(deg) weights).

    Shape: the same shared-endpoint wedge join as co-citation, over the
    undirected neighbor table; ``max_degree`` caps the shared-neighbor
    hub exactly like the second-order measures (a mega-hub neighbor
    fans out quadratically and carries no signal).
    """
    from unarxive_spark.operators.components import undirected

    nbr = undirected(edges).select("u", "v").distinct()
    if max_degree is not None:
        # cap on the SHARED endpoint (u = the common neighbor)
        hub = nbr.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        nbr = nbr.join(
            hub.filter(F.col("_d") <= max_degree), "u", "left_semi"
        )
    deg = nbr.groupBy("v").agg(F.count(F.lit(1)).alias("_deg"))
    shared = (
        nbr.alias("l")
        .join(
            nbr.alias("r"),
            (F.col("l.u") == F.col("r.u")) & (F.col("l.v") < F.col("r.v")),
        )
        .groupBy(F.col("l.v").alias("a"), F.col("r.v").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(
            deg.select(F.col("v").alias("a"), F.col("_deg").alias("da")),
            "a",
        )
        .join(
            deg.select(F.col("v").alias("b"), F.col("_deg").alias("db")),
            "b",
        )
        .select(
            "a",
            "b",
            "n_shared",
            (
                F.col("n_shared")
                / (F.col("da") + F.col("db") - F.col("n_shared"))
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def adamic_adar(
    edges: DataFrame,
    min_shared: int = 1,
    max_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003):
    ``AA(a,b) = Σ_{u ∈ N(a)∩N(b)} 1/ln(deg(u))`` — common neighbors
    weighted inversely by how promiscuous they are.

    Portable-parity discipline: the per-neighbor weight is computed
    ONCE per u as ``round(1e9 / ln(deg_u))`` and summed as an exact
    BIGINT, so the pair score is independent of float summation order
    (a naive double sum would be order-dependent across engines).
    With the hub cap, ``deg_u ∈ [2, max_degree]`` — a tiny integer
    domain on which JVM ``log`` and DuckDB ``ln`` agree (pinned by
    tests/test_driver_parity.py's value hash on q107).

    → ``(a, b, n_shared, aa_e9 long, aa double)``; shape is the same
    shared-endpoint wedge join as ``neighbor_jaccard`` (hub cap on the
    shared neighbor — a mega-hub fans out quadratically and its
    1/ln(deg) weight is noise anyway).
    """
    from unarxive_spark.operators.components import undirected

    nbr = undirected(edges).select("u", "v").distinct()
    if max_degree is not None:
        hub = nbr.groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        nbr = nbr.join(
            hub.filter(F.col("_d") <= max_degree), "u", "left_semi"
        )
    # a surviving u keeps ALL its rows, so this is its true degree
    w = (
        nbr.groupBy("u")
        .agg(F.count(F.lit(1)).alias("_deg"))
        .filter(F.col("_deg") >= 2)
        .select(
            "u",
            F.round(F.lit(1e9) / F.log(F.col("_deg")))
            .cast("long")
            .alias("_w_e9"),
        )
    )
    wn = nbr.join(w, "u")
    pairs = (
        wn.alias("l")
        .join(
            wn.alias("r"),
            (F.col("l.u") == F.col("r.u")) & (F.col("l.v") < F.col("r.v")),
        )
        .groupBy(F.col("l.v").alias("a"), F.col("r.v").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(F.col("l._w_e9")).alias("aa_e9"),
        )
        .filter(F.col("n_shared") >= min_shared)
    )
    return pairs.select(
        "a",
        "b",
        "n_shared",
        F.col("aa_e9").cast("long").alias("aa_e9"),
        F.round(F.col("aa_e9") / 1e9, 6).alias("aa"),
    )


def bibliographic_coupling(
    edges: DataFrame, min_count: int = 1, max_degree: int | None = None
) -> DataFrame:
    """(a, b, n_common_cited) for a < b; hubs capped by in-degree of the
    shared cited conversation when ``max_degree`` is set."""
    e = _filtered(edges, "dst_conv_id", max_degree)
    pairs = (
        e.alias("l")
        .join(
            e.alias("r"),
            (F.col("l.dst_conv_id") == F.col("r.dst_conv_id"))
            & (F.col("l.src_conv_id") < F.col("r.src_conv_id")),
        )
        .groupBy(
            F.col("l.src_conv_id").alias("a"),
            F.col("r.src_conv_id").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common_cited"))
    )
    return pairs.filter(F.col("n_common_cited") >= min_count)
