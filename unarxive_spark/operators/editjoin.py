"""SymSpell-style edit-distance candidate join.

The dedup family (``operators/dedup.py``) covers token-set similarity
(MinHash/Jaccard/containment) but nothing covered EDIT distance — the
reference's fuzzy analog is the title cascade's drop-first/last-token
retry (``/root/reference/src/match_references_openalex.py:230-314``),
a hand-rolled candidate generator followed by exact verification.

SymSpell (Garbe, 2012 — symmetric delete spelling correction): if
``levenshtein(a, b) <= d`` then some ``<=d``-deletion variant of ``a``
equals some ``<=d``-deletion variant of ``b``.  So candidate
generation is an EQUI-JOIN on deletion-neighborhood keys — no
cartesian, no prefix scans — followed by the exact ``levenshtein``
verify (a JVM built-in in Spark, identical unit-cost semantics in
DuckDB, so the driver oracle replays the whole operator).

100-TB shape: key generation is ROW-LOCAL (an array of at most
``1 + L + L^2/2`` short strings per row, HOF-built, no UDF); the only
shuffles are the key equi-join and the candidate-pair distinct.  The
verify runs per candidate pair — the candidate set is bounded by key
collisions, not |input|^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["symspell_join"]


def _deletions(s):
    """All single-character deletions of string column/lambda-var ``s``
    as an array (1-indexed substring splice; length-0 input would make
    sequence(1, 0) DESCEND, so callers must pre-filter short strings)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.length(s)),
        ),
    )


def symspell_join(
    df: DataFrame,
    string_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Pairs within ``levenshtein <= max_distance`` →
    ``(a, b, dist long)`` with ``a < b``.

    ``max_distance`` ∈ {1, 2}.  Strings of length <= max_distance are
    dropped (their deletion neighborhoods collapse to the empty string,
    whose key bucket would cross-join all short strings; SymSpell
    deployments impose the same minimum-length contract).
    """
    if max_distance not in (1, 2):
        raise ValueError("symspell_join: max_distance must be 1 or 2")
    s = F.col(string_col)
    strings = (
        df.select(s.alias("s"))
        .filter(F.length("s") > max_distance)
        .distinct()
    )
    d1 = _deletions(F.col("s"))
    keys = F.concat(F.array(F.col("s")), d1)
    if max_distance == 2:
        keys = F.concat(
            keys, F.flatten(F.transform(d1, lambda v: _deletions(v)))
        )
    keyed = strings.select(
        "s", F.explode(F.array_distinct(keys)).alias("k")
    )
    cand = (
        keyed.alias("l")
        .join(
            keyed.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.s") < F.col("r.s"))
            # lossless length prune: levenshtein >= |len(a) - len(b)|,
            # applied inside the join so mismatched-length bucket pairs
            # never reach the distinct (guide §2.3)
            & (
                F.abs(F.length(F.col("l.s")) - F.length(F.col("r.s")))
                <= F.lit(int(max_distance))
            ),
        )
        .select(F.col("l.s").alias("a"), F.col("r.s").alias("b"))
        .distinct()
    )
    dist = F.levenshtein("a", "b")
    return cand.filter(dist <= max_distance).select(
        "a", "b", dist.cast("long").alias("dist")
    )
