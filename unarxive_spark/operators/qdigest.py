"""Mergeable quantile sketch (q-digest) — deterministic, integer state.

The one summary the sketch family (FM distinct / Count-Min frequency /
Bloom membership) still lacked: quantiles.  Exact grouped quantiles
(q64, Spark ``percentile``) force a full per-group sort at 100 TB; a
mergeable sketch reduces each partition to a bounded node table that
combines with ``sum`` and answers any quantile with bounded rank error.

Why q-digest (Shrivastava, Buragohain, Agrawal, Suri — "Medians and
beyond: new aggregation techniques for sensor networks", SenSys 2004)
and not KLL/t-digest: KLL's compaction keeps/drops alternate elements
of a sorted buffer under a (de)randomized coin and is insertion-order
dependent — no cross-engine value check is possible.  t-digest averages
centroids in floating point — same problem.  The q-digest is a PURE
FUNCTION of the value multiset: quantize values onto ``2^bits`` leaves
of a fixed binary tree, count, then bottom-up merge any (children +
parent) group whose combined count is <= floor(n/k) into the parent.
Everything is integer arithmetic on (level, idx, cnt) triples, so a
DuckDB replay reproduces the digest BIT-FOR-BIT (same discipline as
``operators/sketch.py``; reference capability analog: the percentile
columns of the reference's stats matrices,
``/root/reference/src/utility_scripts/calc_stats.py`` summary tables).

100-TB shape:
- The ONLY data-sized shuffle is the leaf histogram — a map-side
  combinable ``groupBy(count)`` bounded by ``2^bits`` distinct keys per
  group regardless of row count.
- The compression loop then runs on digest-sized state (<= 2^bits rows
  per group, shrinking every level) for exactly ``bits`` rounds —
  independent of n.  Each round is one partial-agg groupBy + two
  hash anti-joins; state is localCheckpoint-ed per level so the lazy
  plan stays linear (each level references the previous one 4x — the
  same 4^levels inlining blowup the MATERIALIZED-CTE oracles guard
  against, bit by q51's DuckDB fd exhaustion in round 3).
- Digests merge by unioning node tables, summing counts, and
  re-compressing — mergeable across partitions, days, snapshots.

Error bound: every merge keeps the combined count <= floor(n/k), so an
estimated quantile's rank is off by at most the counts cached on the
<= ``bits`` ancestors of the answering node: rank error <=
``bits * floor(n/k)``.  The accuracy pytest asserts this envelope
against the exact q64 quantiles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "qdigest",
    "qdigest_merge",
    "qdigest_quantiles",
    "qdigest_trim",
    "qdigest_sql",
    "qdigest_quantiles_sql",
    "qdigest_merge_sql",
    "quantize_sql",
]


def _quantize(value_col: str, lo: float, hi: float, bits: int) -> F.Column:
    """Leaf index in [0, 2^bits): linear quantization with boundary
    clamping.  Plain IEEE multiply/divide — identical in Spark and
    DuckDB (no engine-private rounding paths)."""
    u = 1 << bits
    raw = F.floor(
        (F.col(value_col) - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(u))
    ).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(u - 1))


def _make_sweep(group_cols: list[str], bits: int):
    """applyInPandas body: deterministic bottom-up merge sweep over ONE
    group's node table.  Merges are decided independently per parent,
    so no ordering anywhere can change the result — the DuckDB unrolled
    replay and this sweep agree bit-for-bit."""
    import pandas as pd  # noqa: F401 (arrow batch type)

    def _sweep(pdf):
        thr = int(pdf["__thr"].iloc[0])
        by_level: dict[int, dict[int, int]] = {}
        for lvl_val, grp in pdf.groupby("level"):
            by_level[int(lvl_val)] = dict(
                zip(grp["idx"].astype("int64"), grp["cnt"].astype("int64"))
            )
        for lvl in range(bits):
            ch = by_level.get(lvl, {})
            par = by_level.setdefault(lvl + 1, {})
            csum: dict[int, int] = {}
            for idx, c in ch.items():
                csum[idx >> 1] = csum.get(idx >> 1, 0) + c
            for pidx, cc in csum.items():
                if cc + par.get(pidx, 0) <= thr:
                    par[pidx] = cc + par.get(pidx, 0)
                    ch.pop(pidx * 2, None)
                    ch.pop(pidx * 2 + 1, None)
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        out_rows = [
            {**keys, "level": lvl, "idx": idx, "cnt": cnt, "__thr": thr}
            for lvl, nodes in by_level.items()
            for idx, cnt in nodes.items()
        ]
        import pandas as _pd

        return _pd.DataFrame(
            out_rows,
            columns=[*group_cols, "level", "idx", "cnt", "__thr"],
        )

    return _sweep


def _compress(
    nodes: DataFrame, group_cols: list[str], bits: int
) -> DataFrame:
    """Bottom-up q-digest compression sweep.  ``nodes`` carries
    ``(*group_cols, level, idx, cnt, __thr)``; returns the same shape
    with the digest property restored (every merged run <= __thr).

    Shape: the sweep cascades counts upward level by level — expressed
    as DataFrame ops that is ``bits`` chained groupBy+join rounds over
    checkpointed state (measured 12× slower at toy scale and 3·bits
    extra shuffles at any scale).  But the state is group-local and
    BOUNDED (<= 2^bits rows per group, by construction of the leaf
    histogram), so this is precisely the applyInPandas case: ONE
    shuffle to co-locate each group's histogram, then an integer-only
    vectorized sweep per Arrow batch.  Max batch = 2^bits rows
    regardless of data size, so no skew risk at 100 TB."""
    g = group_cols
    schema_g = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in nodes.schema.fields
        if f.name in g
    )
    out_schema = f"{schema_g}, level int, idx long, cnt long, __thr long"
    return nodes.groupBy(*g).applyInPandas(
        _make_sweep(g, bits), schema=out_schema
    )


def qdigest(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: int = 256,
    bits: int = 16,
    lo: float = 0.0,
    hi: float = 1024.0,
) -> DataFrame:
    """Per-group q-digest over ``value_col`` →
    ``(*group_cols, level int, idx long, cnt long)``.

    ``k`` is the compression knob: digest size O(k·bits) nodes, rank
    error <= ``bits * floor(n/k)``.  NULL values are excluded (same
    convention as every aggregate in the repo); values outside
    ``[lo, hi)`` clamp to the boundary leaves.
    """
    g = list(group_cols)
    leaves = (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, _quantize(value_col, lo, hi, bits).alias("idx"))
        .groupBy(*g, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("level", F.lit(0))
    )
    totals = leaves.groupBy(*g).agg(
        F.floor(F.sum("cnt") / F.lit(int(k))).cast("long").alias("__thr")
    )
    nodes = leaves.join(totals, g).select(
        *g, "level", "idx", "cnt", "__thr"
    )
    return _compress(nodes, g, bits).select(
        *g, F.col("level").cast("int").alias("level"), "idx", "cnt"
    )


def qdigest_merge(
    d1: DataFrame,
    d2: DataFrame,
    group_cols: Sequence[str],
    k: int = 256,
    bits: int = 16,
) -> DataFrame:
    """Merge two digests: union node tables, sum counts per node,
    re-derive the threshold from the COMBINED total, re-compress."""
    g = list(group_cols)
    summed = (
        d1.unionByName(d2)
        .groupBy(*g, "level", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    totals = summed.groupBy(*g).agg(
        F.floor(F.sum("cnt") / F.lit(int(k))).cast("long").alias("__thr")
    )
    nodes = summed.join(totals, g).select(
        *g, "level", "idx", "cnt", "__thr"
    )
    return _compress(nodes, g, bits).select(
        *g, F.col("level").cast("int").alias("level"), "idx", "cnt"
    )


def qdigest_quantiles(
    digest: DataFrame,
    group_cols: Sequence[str],
    probs: Sequence[float],
    bits: int = 16,
    lo: float = 0.0,
    hi: float = 1024.0,
) -> DataFrame:
    """Answer quantiles from a digest →
    ``(*group_cols, prob double, q_leaf long, q_value double)``.

    Canonical traversal: nodes sorted by (interval upper bound ASC,
    level ASC — narrower first), running count; quantile p answers with
    the upper bound of the first node whose running count reaches
    ``ceil(p * n)``.  ``q_leaf`` is the integer leaf index (exact
    cross-engine compare); ``q_value`` dequantizes to the leaf's upper
    value edge.
    """
    from pyspark.sql import Window

    if not probs:
        raise ValueError("probs must be non-empty")
    g = list(group_cols)
    u = 1 << bits
    # shiftleft's numBits argument must be a literal in the Python API —
    # go through expr for the column-valued shift
    ub = (F.col("idx") + 1) * F.expr(
        "shiftleft(CAST(1 AS BIGINT), level)"
    ) - 1
    w = Window.partitionBy(*g).orderBy("ub", "level")
    ranked = digest.select(
        *g, "level", "cnt", ub.alias("ub")
    ).withColumn("cum", F.sum("cnt").over(w))
    totals = digest.groupBy(*g).agg(F.sum("cnt").alias("n"))
    out = None
    for p in probs:
        rank = F.greatest(
            F.ceil(F.lit(float(p)) * F.col("n")).cast("long"), F.lit(1)
        )
        hit = (
            ranked.join(totals, g)
            .filter(F.col("cum") >= rank)
            .groupBy(*g)
            .agg(F.min("ub").alias("q_leaf"))
            .select(*g, F.lit(float(p)).alias("prob"), "q_leaf")
        )
        out = hit if out is None else out.unionByName(hit)
    q_val = F.lit(float(lo)) + (
        (F.col("q_leaf") + 1).cast("double")
        / F.lit(float(u))
        * F.lit(float(hi) - float(lo))
    )
    return out.select(*g, "prob", "q_leaf", q_val.alias("q_value"))


# ---------------------------------------------------------------------
# DuckDB replays (driver-oracle builders)
# ---------------------------------------------------------------------


def quantize_sql(
    value_expr: str, lo: float, hi: float, bits: int
) -> str:
    """DuckDB rendering of :func:`_quantize` — identical IEEE
    arithmetic, identical clamping."""
    u = 1 << bits
    return (
        f"LEAST(GREATEST(CAST(floor((({value_expr}) - {lo!r}e0)"
        f" / {float(hi) - float(lo)!r}e0 * {float(u)!r}e0) AS BIGINT),"
        f" 0), {u - 1})"
    )


def _compress_rounds(
    group_cols: Sequence[str], bits: int, prefix: str = ""
) -> tuple[list[str], str]:
    """The bottom-up sweep as ``bits`` unrolled rounds reading from
    ``{prefix}n0`` (any node table shaped ({g}, idx, cnt, level, thr))
    — shared by the build, quantile, and merge oracles.  MATERIALIZED
    is load-bearing: each round reads the previous 3× (3^bits inlined
    scans otherwise — the q51 failure mode from round 3)."""
    g = ", ".join(group_cols)
    xg = ", ".join(f"x.{c}" for c in group_cols)
    on_g = " AND ".join(f"d.{c} = x.{c}" for c in group_cols)
    parts = []
    for lvl in range(bits):
        parts.append(f"""{prefix}k{lvl} AS (
  SELECT {g}, idx >> 1 AS pidx, sum(cnt) AS ccnt, max(thr) AS thr
  FROM {prefix}n{lvl} WHERE level = {lvl} GROUP BY ALL
),
{prefix}d{lvl} AS MATERIALIZED (
  SELECT x.*, x.ccnt + coalesce(p.cnt, 0) AS tot
  FROM {prefix}k{lvl} x
  LEFT JOIN (SELECT * FROM {prefix}n{lvl} WHERE level = {lvl + 1}) p
    ON {" AND ".join(f"p.{c} = x.{c}" for c in group_cols)}
       AND p.idx = x.pidx
  WHERE x.ccnt + coalesce(p.cnt, 0) <= x.thr
),
{prefix}n{lvl + 1} AS MATERIALIZED (
  SELECT {g}, idx, cnt, level, thr FROM {prefix}n{lvl}
  WHERE level NOT IN ({lvl}, {lvl + 1})
  UNION ALL
  SELECT {xg}, x.idx, x.cnt, x.level, x.thr
  FROM {prefix}n{lvl} x WHERE x.level = {lvl} AND NOT EXISTS (
    SELECT 1 FROM {prefix}d{lvl} d WHERE {on_g}
      AND d.pidx = (x.idx >> 1))
  UNION ALL
  SELECT {xg}, x.idx, x.cnt, x.level, x.thr
  FROM {prefix}n{lvl} x WHERE x.level = {lvl + 1} AND NOT EXISTS (
    SELECT 1 FROM {prefix}d{lvl} d WHERE {on_g} AND d.pidx = x.idx)
  UNION ALL
  SELECT {g}, pidx, CAST(tot AS BIGINT), {lvl + 1}, thr
  FROM {prefix}d{lvl}
)""")
    return parts, f"{prefix}n{bits}"


def _qdigest_ctes(
    table: str,
    value_expr: str,
    group_cols: Sequence[str],
    k: int,
    bits: int,
    lo: float,
    hi: float,
    prefix: str = "",
) -> tuple[str, str]:
    """Shared WITH-body for the digest build (used by the state,
    quantile, and merge oracles).  Returns (cte_body, final_name)."""
    g = ", ".join(group_cols)
    quant = quantize_sql(value_expr, lo, hi, bits)
    parts = [
        f"""{prefix}t0 AS MATERIALIZED (
  SELECT {g}, {quant} AS idx FROM {table}
  WHERE ({value_expr}) IS NOT NULL
),
{prefix}lv AS MATERIALIZED (
  SELECT {g}, idx, CAST(count(*) AS BIGINT) AS cnt
  FROM {prefix}t0 GROUP BY ALL
),
{prefix}th AS MATERIALIZED (
  SELECT {g}, CAST(floor(sum(cnt) / {int(k)}) AS BIGINT) AS thr
  FROM {prefix}lv GROUP BY ALL
),
{prefix}n0 AS MATERIALIZED (
  SELECT {prefix}lv.*, 0 AS level, {prefix}th.thr
  FROM {prefix}lv JOIN {prefix}th USING ({g})
)"""
    ]
    rounds, final = _compress_rounds(group_cols, bits, prefix)
    parts.extend(rounds)
    return ",\n".join(parts), final


def qdigest_merge_sql(
    table_a: str,
    table_b: str,
    value_expr: str,
    group_cols: Sequence[str],
    k: int = 256,
    bits: int = 16,
    lo: float = 0.0,
    hi: float = 1024.0,
) -> str:
    """DuckDB rendering of :func:`qdigest_merge` over digests built
    from two sources: build each digest, union node tables summing
    counts, re-derive the threshold from the combined total, and
    re-compress with the same sweep."""
    g = ", ".join(group_cols)
    ctes_a, fin_a = _qdigest_ctes(
        table_a, value_expr, group_cols, k, bits, lo, hi, prefix="a"
    )
    ctes_b, fin_b = _qdigest_ctes(
        table_b, value_expr, group_cols, k, bits, lo, hi, prefix="b"
    )
    merge_head = f"""mu AS MATERIALIZED (
  SELECT {g}, level, idx, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
    SELECT {g}, level, idx, cnt FROM {fin_a}
    UNION ALL
    SELECT {g}, level, idx, cnt FROM {fin_b}
  ) GROUP BY ALL
),
mth AS MATERIALIZED (
  SELECT {g}, CAST(floor(sum(cnt) / {int(k)}) AS BIGINT) AS thr
  FROM mu GROUP BY ALL
),
mn0 AS MATERIALIZED (
  SELECT mu.{g.replace(", ", ", mu.")}, mu.idx, mu.cnt, mu.level,
         mth.thr
  FROM mu JOIN mth USING ({g})
)"""
    rounds, final = _compress_rounds(group_cols, bits, prefix="m")
    body = ",\n".join([ctes_a, ctes_b, merge_head, *rounds])
    return (
        f"WITH {body}\n"
        f"SELECT {g}, CAST(level AS INT) AS level, idx, cnt FROM {final}"
    )


def qdigest_sql(
    table: str,
    value_expr: str,
    group_cols: Sequence[str],
    k: int = 256,
    bits: int = 16,
    lo: float = 0.0,
    hi: float = 1024.0,
) -> str:
    """DuckDB rendering of :func:`qdigest` — identical quantization,
    thresholds, and bottom-up sweep."""
    g = ", ".join(group_cols)
    ctes, final = _qdigest_ctes(table, value_expr, group_cols, k, bits, lo, hi)
    return (
        f"WITH {ctes}\n"
        f"SELECT {g}, CAST(level AS INT) AS level, idx, cnt FROM {final}"
    )


def qdigest_quantiles_sql(
    table: str,
    value_expr: str,
    group_cols: Sequence[str],
    probs: Sequence[float],
    k: int = 256,
    bits: int = 16,
    lo: float = 0.0,
    hi: float = 1024.0,
) -> str:
    """DuckDB rendering of :func:`qdigest_quantiles` (digest build +
    canonical sorted traversal)."""
    g = ", ".join(group_cols)
    u = 1 << bits
    ctes, final = _qdigest_ctes(table, value_expr, group_cols, k, bits, lo, hi)
    arms = "\nUNION ALL\n".join(
        f"""SELECT {g}, {float(p)!r}e0 AS prob, min(ub) AS q_leaf
FROM rkd WHERE cum >= GREATEST(CAST(ceil({float(p)!r}e0 * n) AS BIGINT), 1)
GROUP BY {g}"""
        for p in probs
    )
    return f"""WITH {ctes},
rkd AS MATERIALIZED (
  SELECT {g}, level, cnt,
         (idx + 1) * (CAST(1 AS BIGINT) << level) - 1 AS ub,
         sum(cnt) OVER (PARTITION BY {g} ORDER BY
           (idx + 1) * (CAST(1 AS BIGINT) << level) - 1, level) AS cum,
         sum(cnt) OVER (PARTITION BY {g}) AS n
  FROM {final}
),
hits AS ({arms})
SELECT {g}, prob, q_leaf,
       {lo!r}e0 + CAST(q_leaf + 1 AS DOUBLE) / {float(u)!r}e0
         * {float(hi) - float(lo)!r}e0 AS q_value
FROM hits"""


def qdigest_trim(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo_p: float = 0.01,
    hi_p: float = 0.99,
    k: int = 256,
    bits: int = 16,
    lo: float = 0.0,
    hi: float = 1024.0,
) -> DataFrame:
    """Percentile outlier trim driven by the digest: keep rows whose
    QUANTIZED value lies within the group's [lo_p, hi_p] digest
    quantile leaves — the approximate-percentile data-cleaning filter a
    training pipeline runs where exact per-group quantiles would force
    a full sort.  The bounds are integer leaf indices from the sketch,
    so the kept/dropped decision is exact and cross-engine checkable.

    Returns the input rows (all columns) plus ``__keep int``.  Shape:
    one digest build + a groups-sized broadcast join — no sort of the
    data."""
    g = list(group_cols)
    d = qdigest(df, value_col, g, k=k, bits=bits, lo=lo, hi=hi)
    qs = qdigest_quantiles(
        d, g, [float(lo_p), float(hi_p)], bits=bits, lo=lo, hi=hi
    )
    bounds = qs.groupBy(*g).agg(
        F.min(
            F.when(F.col("prob") == float(lo_p), F.col("q_leaf"))
        ).alias("__lo_leaf"),
        F.min(
            F.when(F.col("prob") == float(hi_p), F.col("q_leaf"))
        ).alias("__hi_leaf"),
    )
    leaf = _quantize(value_col, lo, hi, bits)
    return (
        df.filter(F.col(value_col).isNotNull())
        .join(F.broadcast(bounds), g)
        .withColumn(
            "__keep",
            (
                (leaf >= F.col("__lo_leaf"))
                & (leaf <= F.col("__hi_leaf"))
            ).cast("int"),
        )
        .drop("__lo_leaf", "__hi_leaf")
    )
