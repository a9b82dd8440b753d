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
census; ``max_degree`` (off by default — the default census is exact)
drops mega-hub vertices from the graph before counting, the same
degree-cap treatment as ``cocitation.adamic_adar`` — the census is then
the exact census of the hub-capped subgraph, stated as such.
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


def _linked_count(code: int) -> int:
    """Number of LINKED dyads (any arc) in the triple."""
    n = 0
    for i, j in ((0, 1), (0, 2), (1, 2)):
        if (code >> _SLOT[(i, j)] & 1) or (code >> _SLOT[(j, i)] & 1):
            n += 1
    return n


def _g_counts(code: int) -> tuple[int, int]:
    """Per triad: # mutual / # asym dyads whose OPPOSITE vertex is
    adjacent (>= 1 arc) to BOTH endpoints — the exact coefficient of
    Σ common(a,b) over pairs of that dyad type (permutation-invariant,
    so well-defined per canonical class)."""
    gm = ga = 0
    for i, j in ((0, 1), (0, 2), (1, 2)):
        f = code >> _SLOT[(i, j)] & 1
        b = code >> _SLOT[(j, i)] & 1
        if not (f or b):
            continue
        k = ({0, 1, 2} - {i, j}).pop()
        adj_i = (code >> _SLOT[(i, k)] & 1) or (code >> _SLOT[(k, i)] & 1)
        adj_j = (code >> _SLOT[(j, k)] & 1) or (code >> _SLOT[(k, j)] & 1)
        if adj_i and adj_j:
            if f and b:
                gm += 1
            else:
                ga += 1
    return gm, ga


# per canonical class: generation multiplicity |L|(|L|-1) and the
# Σ-common coefficients; only classes with >= 2 linked dyads are ever
# generated by the candidate join
TRIAD_DIM: list[tuple[int, str, int, int, int]] = [
    (
        c,
        t,
        _linked_count(c) * (_linked_count(c) - 1),
        *_g_counts(c),
    )
    for c, t in sorted(TRIAD_TYPES.items())
]


def triad_census(
    edges: DataFrame,
    eager: bool = True,
    max_degree: int | None = None,
    broadcast_pairs_max: int = 4_000_000,
) -> DataFrame:
    """16-row census → ``(triad_type string, n_triads long)``.

    No triple-level ``distinct`` and no per-pair aggregation: every
    candidate row (linked pair × adjacent third vertex) is classified,
    and a triple with |L| linked dyads appears EXACTLY |L|·(|L|−1)
    times — a pure function of its canonical class — so the class
    count is an exact integer division.  The single-dyad classes
    (012/102) come from the identity
    ``Σ_T (n − 2 − |N(a) ∪ N(b) \\ {a,b}|)
      = P_T·n − Σ_T (deg a + deg b) + C_T``
    where ``C_T = Σ_class count · g_T`` re-uses the census itself for
    the Σ-common term — no second data-sized shuffle.

    ``max_degree`` drops vertices whose undirected neighbor count
    exceeds the cap BEFORE counting (default None = exact census):
    the Σd² wedge volume is then bounded by |V|·max_degree².

    The dyad table is data-sized (one row per linked pair), so its
    three bit-lookup joins are broadcast ONLY when the measured pair
    count is ≤ ``broadcast_pairs_max`` (the cached table is counted
    anyway); above the bound they are plain equi-joins and AQE picks
    the strategy from real sizes — a forced broadcast of an O(E) table
    would OOM executors at scale (r5 verdict finding #1).

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
    if max_degree is not None:
        und0 = de.select("u", "v").unionByName(
            de.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        hubs = (
            und0.groupBy("u")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") > int(max_degree))
            .select("u")
        )
        de = (
            de.join(hubs, "u", "left_anti")
            .join(hubs.withColumnRenamed("u", "v"), "v", "left_anti")
            .select("u", "v")
        )
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
    # one cheap count over the cached dyad table gates the broadcast
    # hint (and warms the cache for its four consumers)
    n_pairs = lp.count()
    small_pairs = n_pairs <= int(broadcast_pairs_max)
    nbr = de.select("u", "v").unionByName(
        de.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().cache()
    deg = nbr.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    n_row = F.broadcast(
        deg.agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )

    # Candidate generation CARRIES the dyad bits it already knows: the
    # generating pair (a,b) rides on lp, and the adjacency edge that
    # produced w is itself a linked pair, so joining against the
    # bit-augmented neighbor view (``nbrb``) hands each candidate TWO
    # of its three dyad codes for free.  Only the opposite pair needs a
    # lookup — ONE equi-join over the Σd² wedge table instead of the
    # three the r5 plan paid (guide §2.4).  Slot arithmetic is
    # row-local: a pair's code contribution is ``(fwd + 2·bwd) · m``
    # with m ∈ {1, 4, 16} by the pair's slot in the sorted triple, and
    # since the three pairs occupy the three slots exactly once the
    # third multiplier is ``21 − m₁ − m₂``.
    nbrb = lp.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "fwd", "bwd"
    ).unionByName(
        lp.select(
            F.col("b").alias("u"), F.col("a").alias("v"), "fwd", "bwd"
        )
    )

    # ONE wedge join: the probe side is the pair table expanded to both
    # endpoints (2|lp| rows) BEFORE the join, so the neighbor view is
    # shuffled once instead of once per leg (the wedge OUTPUT volume is
    # identical either way — Σd² is inherent).
    def _probe(end: str, other: str) -> DataFrame:
        return lp.select(
            "a",
            "b",
            (F.col("fwd") + 2 * F.col("bwd")).alias("_c_ab"),
            F.col(end).alias("_e"),
            F.col(other).alias("_o"),
        )

    cand = (
        _probe("a", "b")
        .unionByName(_probe("b", "a"))
        .join(
            nbrb.select(
                F.col("u").alias("_e"),
                F.col("v").alias("w"),
                (F.col("fwd") + 2 * F.col("bwd")).alias("_c_ew"),
            ),
            "_e",
        )
        .filter((F.col("w") != F.col("a")) & (F.col("w") != F.col("b")))
    )
    # Slot multiplier of a pair within the sorted triple (x, y, z) —
    # (x,y)→1, (x,z)→4, (y,z)→16 — is a pure function of where the
    # pair's EXCLUDED vertex sits: excluded == z (the max) → the pair is
    # (x,y) → 1; excluded == x (the min) → 16; else (middle) → 4.  Two
    # compares per pair against the row's min/max instead of the old
    # per-pair least/greatest plus an array_sort for the middle element.
    l3 = F.least("a", "b", "w")
    g3 = F.greatest("a", "b", "w")

    def _mult_excl(t):
        return (
            F.when(t == g3, F.lit(1))
            .when(t == l3, F.lit(16))
            .otherwise(F.lit(4))
            .cast("long")
        )

    m_ab = _mult_excl(F.col("w"))
    m_ew = _mult_excl(F.col("_o"))
    known = cand.select(
        # third pair = (other endpoint, w); its slot multiplier is the
        # one the two known pairs leave over
        F.least("_o", "w").alias("ta"),
        F.greatest("_o", "w").alias("tb"),
        (F.col("_c_ab") * m_ab + F.col("_c_ew") * m_ew).alias("_c_known"),
        (F.lit(21) - m_ab - m_ew).alias("_m3"),
    )

    third = lp.select(
        F.col("a").alias("ta"),
        F.col("b").alias("tb"),
        (F.col("fwd") + 2 * F.col("bwd")).alias("_c3"),
    )
    third = F.broadcast(third) if small_pairs else third
    coded = known.join(third, ["ta", "tb"], "left").select(
        (
            F.col("_c_known")
            + F.coalesce(F.col("_c3"), F.lit(0)) * F.col("_m3")
        ).cast("long").alias("code")
    )
    canon = F.expr(canonical_sql_expr("code", "spark"))
    dim = F.broadcast(
        spark.createDataFrame(
            TRIAD_DIM,
            "canon long, triad_type string, m long, g_mut long, g_asym long",
        )
    )
    # ONE map-side-combinable pass over the wedge volume — grouped by
    # the RAW 6-bit code (64 values), so the canonical min-over-6-
    # permutations expression (36 shift/mask terms) runs on at most 64
    # aggregated rows instead of once per Σd² wedge row; the map side
    # pays only the row-local code arithmetic.  A second 64→16-row
    # aggregate folds codes into canonical classes.
    multi = (
        coded.groupBy("code")
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(canon.alias("canon"), "rows")
        .groupBy("canon")
        .agg(F.sum("rows").alias("rows"))
    )
    if eager:
        # 16-row pivot of the whole census, materialized BEFORE the dim
        # join: (a) the one data-sized pass is evaluated exactly once
        # (csum/counted/total/final all reuse it), and (b) the inner
        # join on canon would otherwise infer ``isnotnull(canon)`` and
        # Catalyst pushes that constraint below BOTH aggregates — the
        # full 36-term canonical expression re-evaluated per Σd² wedge
        # row as a filter (measured 6.8 s → 56 s at sf0.1); the
        # checkpoint is a pushdown barrier at ≤64 rows.
        multi = multi.localCheckpoint(eager=True)
    multi = multi.join(dim, "canon").select(
        "canon",
        "g_mut",
        "g_asym",
        F.expr("rows div m").alias("n_triads"),
    )

    # dyad-level scalars for the single-dyad identity
    dl = lp.join(deg.withColumnRenamed("u", "a"), "a").join(
        deg.withColumnRenamed("u", "b").withColumnRenamed("deg", "deg_b"),
        "b",
    )
    mut = (F.col("fwd") == 1) & (F.col("bwd") == 1)
    scal = F.broadcast(
        dl.agg(
            F.sum(mut.cast("long")).alias("p_mut"),
            F.sum((~mut).cast("long")).alias("p_asym"),
            F.sum(F.when(mut, F.col("deg") + F.col("deg_b"))).alias(
                "s_mut"
            ),
            F.sum(
                F.when(~mut, F.col("deg") + F.col("deg_b"))
            ).alias("s_asym"),
        ).select(
            *[
                F.coalesce(F.col(c), F.lit(0).cast("long")).alias(c)
                for c in ("p_mut", "p_asym", "s_mut", "s_asym")
            ]
        )
    )
    csum = F.broadcast(
        multi.agg(
            F.coalesce(
                F.sum(F.col("n_triads") * F.col("g_mut")),
                F.lit(0).cast("long"),
            ).alias("c_mut"),
            F.coalesce(
                F.sum(F.col("n_triads") * F.col("g_asym")),
                F.lit(0).cast("long"),
            ).alias("c_asym"),
        )
    )
    singles = (
        scal.crossJoin(csum)
        .crossJoin(n_row)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(3).cast("long").alias("canon"),  # 102
                        (
                            F.col("p_mut") * F.col("n")
                            - F.col("s_mut")
                            + F.col("c_mut")
                        ).alias("n_triads"),
                    ),
                    F.struct(
                        F.lit(1).cast("long").alias("canon"),  # 012
                        (
                            F.col("p_asym") * F.col("n")
                            - F.col("s_asym")
                            + F.col("c_asym")
                        ).alias("n_triads"),
                    ),
                )
            ).alias("_s")
        )
        .select("_s.*")
    )
    counted = multi.select("canon", "n_triads").unionByName(singles)
    total = F.broadcast(
        counted.agg(
            F.coalesce(F.sum("n_triads"), F.lit(0).cast("long")).alias("t")
        )
    )
    nulls = (
        n_row.crossJoin(total)
        .select(
            F.lit(0).cast("long").alias("canon"),
            F.expr("n * (n - 1) * (n - 2) div 6 - t")
            .cast("long")
            .alias("n_triads"),
        )
    )
    out = (
        dim.select("canon", "triad_type")
        .join(
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
        out = out.localCheckpoint(eager=True)
        lp.unpersist()
        nbr.unpersist()
    return out
