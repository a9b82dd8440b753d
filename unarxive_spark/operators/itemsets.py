"""A-priori 2-itemset mining and association rules over baskets.

Market-basket co-occurrence is the relational workhorse behind
"users who cited X also cited Y" recommendations; the reference
computes first-order co-citation counts for its citation network
statistics (/root/reference/src/utility_scripts/calc_stats.py) — this
operator generalizes that to support/confidence/lift rules (Agrawal &
Srikant 1994, a-priori pruning).

100-TB shape: ONE shuffle of the basket table on item for the item
counts, a BROADCAST semi-join of the (small, ≤ vocabulary-sized)
frequent-item set against the baskets — the a-priori property: a pair
can only be frequent if both items are — then ONE self-equi-join on
basket id restricted to the pruned baskets.  No cartesian; the only
quadratic term is per-basket pair expansion, bounded by the pruned
basket width (a giant basket after pruning would need a width cap or
salting — documented, not silently applied).

All counts are exact integers; confidence/lift are single
integer-ratio divisions rounded to 6 places, so the DuckDB oracle
reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["association_rules"]


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item_id",
    min_item_support: int = 2,
    min_pair_support: int = 2,
) -> DataFrame:
    """Directed association rules from frequent 2-itemsets.

    Returns one row per ordered rule A→B among frequent pairs:
    ``antecedent, consequent, support_cnt, antecedent_cnt,
    confidence, lift`` (confidence = P(B|A), lift = P(A,B)/P(A)P(B),
    both computed as exact-integer ratios rounded to 6 places).
    """
    b = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_baskets = b.select("b").distinct().agg(
        F.count(F.lit(1)).alias("nb")
    )
    item_cnt = b.groupBy("i").agg(F.count(F.lit(1)).alias("ic"))
    freq_items = item_cnt.filter(F.col("ic") >= int(min_item_support))
    # a-priori prune: only baskets' frequent items can form frequent
    # pairs; the frequent-item set is vocabulary-sized → broadcast.
    pruned = b.join(
        F.broadcast(freq_items.select("i")), "i", "left_semi"
    )
    pairs = (
        pruned.alias("l")
        .join(pruned.alias("r"), "b")
        .filter(F.col("l.i") < F.col("r.i"))
        .groupBy(
            F.col("l.i").alias("ia"), F.col("r.i").alias("ib")
        )
        .agg(F.count(F.lit(1)).alias("pc"))
        .filter(F.col("pc") >= int(min_pair_support))
    )
    # both rule directions from the (ia < ib) canonical pair
    rules = pairs.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "pc",
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"),
            "pc",
        )
    )
    ca = F.broadcast(
        freq_items.select(
            F.col("i").alias("antecedent"), F.col("ic").alias("ca")
        )
    )
    cb = F.broadcast(
        freq_items.select(
            F.col("i").alias("consequent"), F.col("ic").alias("cb")
        )
    )
    return (
        rules.join(ca, "antecedent")
        .join(cb, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("pc").alias("support_cnt"),
            F.col("ca").alias("antecedent_cnt"),
            F.round(
                F.col("pc").cast("double") / F.col("ca"), 6
            ).alias("confidence"),
            F.round(
                (F.col("pc") * F.col("nb")).cast("double")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
