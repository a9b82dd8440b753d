"""Directed triad census (Holland & Leinhardt 1970's 16 MAN types).

The triad census is the classic directed-graph motif spectrum — the
fingerprint social-network analysis and citation-graph studies publish
(003, 012, 102, 021D/U/C, 111D/U, 030T/C, 201, 120D/U/C, 210, 300).

Scalable shape (the Batagelj & Mrvar 2001 insight, re-expressed as
joins): only triples containing at least TWO linked dyads need
explicit classification — and those are exactly the triples
``(linked pair, w)`` where w is adjacent to either endpoint, i.e. one
equi-join of the linked-pair table with the neighbor table (wedge
volume Σd², never n³).  Triples with exactly ONE linked dyad are pure
arithmetic per pair (``n - 2 - |N(a) ∪ N(b) \\ {a,b}|`` into 012 or
102), and the all-null count 003 is ``C(n,3)`` minus everything else.

Classification is row-local integer arithmetic: the 6 dyad bits of the
sorted triple form a code, the canonical form is the minimum over the
6 vertex permutations (a fixed bit-shuffle, generated at import time),
and a 16-row broadcast dim maps canonical codes to MAN labels.  Every
count is an exact int64, so the DuckDB oracle (which brute-forces all
``C(n,3)`` triples — affordable on the capped test domain, never the
engine's plan) reproduces the census bit-for-bit.

Hub caveat: the wedge volume Σd² is the inherent cost of an exact
census; at 100 TB a mega-hub needs the same degree-cap/sampling
treatment the dedup family documents — not silently applied here.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triad_census", "TRIAD_TYPES", "canonical_sql_expr"]

# slot layout for the ordered triple (p, q, r)
_SLOT = {
    (0, 1): 0, (1, 0): 1, (0, 2): 2, (2, 0): 3, (1, 2): 4, (2, 1): 5,
}


def _permute_code(code: int, perm: tuple[int, ...]) -> int:
    out = 0
    for (i, j), s in _SLOT.items():
        if code >> _SLOT[(perm[i], perm[j])] & 1:
            out |= 1 << s
    return out


def _canon(code: int) -> int:
    return min(_permute_code(code, p) for p in permutations(range(3)))


def _classify(code: int) -> str:
    dy = []
    for i, j in ((0, 1), (0, 2), (1, 2)):
        dy.append((code >> _SLOT[(i, j)] & 1, code >> _SLOT[(j, i)] & 1))
    m = sum(1 for f, b in dy if f and b)
    a = sum(1 for f, b in dy if f != b)
    base = f"{m}{a}{3 - m - a}"
    outd, ind = [0, 0, 0], [0, 0, 0]
    for (i, j), s in _SLOT.items():
        if code >> s & 1:
            outd[i] += 1
            ind[j] += 1
    if base == "021":
        return "021D" if 2 in outd else ("021U" if 2 in ind else "021C")
    if base == "030":
        return "030C" if outd == [1, 1, 1] else "030T"
    if base in ("111", "120"):
        for k, (i, j) in enumerate(((0, 1), (0, 2), (1, 2))):
            f, b = dy[k]
            if f and b:
                third = ({0, 1, 2} - {i, j}).pop()
                send = sum(
                    1
                    for x in (i, j)
                    if (code >> _SLOT[(third, x)] & 1)
                    and not (code >> _SLOT[(x, third)] & 1)
                )
                recv = sum(
                    1
                    for x in (i, j)
                    if (code >> _SLOT[(x, third)] & 1)
                    and not (code >> _SLOT[(third, x)] & 1)
                )
                if base == "111":
                    return "111D" if send else "111U"
                if recv == 2:
                    return "120D"
                if send == 2:
                    return "120U"
                return "120C"
    return base


# canonical code -> MAN label, all 16 classes
TRIAD_TYPES: dict[int, str] = {}
for _code in range(64):
    _c = _canon(_code)
    if _c not in TRIAD_TYPES:
        TRIAD_TYPES[_c] = _classify(_c)

# the 6 permutation bit-shuffles as engine-agnostic (src, dst) slot maps
_PERM_MAPS: list[list[tuple[int, int]]] = [
    [(_SLOT[(p[i], p[j])], s) for (i, j), s in _SLOT.items()]
    for p in permutations(range(3))
]


def canonical_sql_expr(code_col: str, dialect: str) -> str:
    """Canonical-code expression (min over the 6 bit-shuffles) in
    Spark SQL (``shiftright``) or DuckDB (``>>``) syntax."""
    terms = []
    for pm in _PERM_MAPS:
        if dialect == "spark":
            parts = [
                f"(shiftright({code_col}, {src}) & 1) * {1 << dst}"
                for src, dst in pm
            ]
        else:
            parts = [
                f"(({code_col} >> {src}) & 1) * {1 << dst}"
                for src, dst in pm
            ]
        terms.append("(" + " + ".join(parts) + ")")
    return "least(" + ", ".join(terms) + ")"


def triad_census(edges: DataFrame, eager: bool = True) -> DataFrame:
    """16-row census → ``(triad_type string, n_triads long)``.

    ``eager=False`` skips the final localCheckpoint (and the dyad-table
    unpersist) so plan-shape tests can inspect the real dataflow."""
    spark = edges.sparkSession
    de = (
        edges.select(
            F.col("src_conv_id").alias("u"), F.col("dst_conv_id").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # linked unordered dyads with both direction bits
    lp = (
        de.select(
            F.least("u", "v").alias("a"),
            F.greatest("u", "v").alias("b"),
            F.when(F.col("u") < F.col("v"), 1).otherwise(0).alias("f"),
            F.when(F.col("u") > F.col("v"), 1).otherwise(0).alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.max("f").alias("fwd"), F.max("w").alias("bwd"))
        .cache()
    )
    nbr = de.select("u", "v").unionByName(
        de.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    n_row = F.broadcast(
        nbr.select("u").distinct().agg(F.count(F.lit(1)).alias("n"))
    )

    # connected-triple candidates: w adjacent to either endpoint
    cand = (
        lp.select("a", "b")
        .join(nbr.withColumnRenamed("u", "a"), "a")
        .select("a", "b", F.col("v").alias("w"))
        .unionByName(
            lp.select("a", "b")
            .join(nbr.withColumnRenamed("u", "b"), "b")
            .select("a", "b", F.col("v").alias("w"))
        )
        .filter((F.col("w") != F.col("a")) & (F.col("w") != F.col("b")))
    )
    # triples with >= 2 linked dyads, classified exactly once
    triples = cand.select(
        F.least("a", "b", "w").alias("x"),
        F.array_sort(F.array("a", "b", "w"))[1].alias("y"),
        F.greatest("a", "b", "w").alias("z"),
    ).distinct()

    def _bits(pair_a: str, pair_b: str, shift: int) -> DataFrame:
        return lp.select(
            F.col("a").alias(pair_a),
            F.col("b").alias(pair_b),
            (F.col("fwd") * (1 << shift)).alias(f"_f{shift}"),
            (F.col("bwd") * (2 << shift)).alias(f"_b{shift}"),
        )

    coded = (
        triples.join(_bits("x", "y", 0), ["x", "y"], "left")
        .join(_bits("x", "z", 2), ["x", "z"], "left")
        .join(_bits("y", "z", 4), ["y", "z"], "left")
        .select(
            (
                sum(
                    F.coalesce(F.col(c), F.lit(0))
                    for c in ("_f0", "_b0", "_f2", "_b2", "_f4", "_b4")
                )
            ).cast("long").alias("code")
        )
    )
    canon = F.expr(canonical_sql_expr("code", "spark"))
    multi = coded.select(canon.alias("canon")).groupBy("canon").agg(
        F.count(F.lit(1)).alias("n_triads")
    )

    # exactly-one-linked-dyad triples: n - 2 - |N(a) ∪ N(b) \ {a,b}|
    adjcnt = cand.groupBy("a", "b").agg(
        F.countDistinct("w").alias("adj")
    )
    singles = (
        lp.join(adjcnt, ["a", "b"], "left")
        .crossJoin(n_row)
        .select(
            F.when((F.col("fwd") == 1) & (F.col("bwd") == 1), F.lit(3))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("canon"),
            (
                F.col("n") - 2 - F.coalesce("adj", F.lit(0))
            ).cast("long").alias("k"),
        )
        .groupBy("canon")
        .agg(F.sum("k").alias("n_triads"))
    )
    counted = multi.unionByName(singles)
    # null triads: C(n,3) minus everything counted above
    total = counted.agg(
        F.coalesce(F.sum("n_triads"), F.lit(0).cast("long")).alias("t")
    )
    nulls = (
        n_row.crossJoin(F.broadcast(total))
        .select(
            F.lit(0).cast("long").alias("canon"),
            F.expr("n * (n - 1) * (n - 2) div 6 - t")
            .cast("long")
            .alias("n_triads"),
        )
    )
    dim = F.broadcast(
        spark.createDataFrame(
            sorted((c, t) for c, t in TRIAD_TYPES.items()),
            "canon long, triad_type string",
        )
    )
    out = (
        dim.join(
            counted.unionByName(nulls).groupBy("canon").agg(
                F.sum("n_triads").alias("n_triads")
            ),
            "canon",
            "left",
        )
        .select(
            "triad_type",
            F.coalesce("n_triads", F.lit(0).cast("long")).alias(
                "n_triads"
            ),
        )
    )
    if eager:
        # 16-row result: evaluate once so the cached dyad table can
        # be released before the caller collects
        out = out.localCheckpoint(eager=True)
        lp.unpersist()
    return out
