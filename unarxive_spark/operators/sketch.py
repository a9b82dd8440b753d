"""Portable distinct-count sketch (Flajolet-Martin / PCSA).

At 100 TB an exact ``count(DISTINCT key)`` per group forces a full
shuffle of every key; the sketch reduces each partition's contribution
to ``n_regs`` small integers that merge with ``max`` — fully map-side
combinable, mergeable across days/snapshots, and O(groups × n_regs)
state.  Spark's built-in ``approx_count_distinct`` is the same idea but
its HLL++ hashing is engine-private; this operator uses the repo's
md5-derived ``h64`` so DuckDB reproduces the estimate BIT-FOR-BIT (the
driver oracle value-checks it, not just the row count).

Per key: ``reg = h64 & (n_regs-1)`` picks a register, ``rho`` = 1-based
position of the lowest set bit of ``h64 >> log2(n_regs)`` (geometric).
Per (group, register): bitmap ``B_j = bit_or(1 << (rho-1))`` of SEEN
ranks; ``R_j`` = number of trailing ones of ``B_j`` (position of the
lowest unseen rank, isolated branch-free as ``log2(~B & (B+1))``).
Estimate (PCSA, Flajolet & Martin 1985):
``n_regs / 0.77351 * 2^(sum_j R_j / n_regs)`` — absent registers have
bitmap 0 → R_j = 0, so the sum/n_regs form needs no dense left-join
against a register dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64, h64_sql

__all__ = [
    "distinct_sketch",
    "distinct_sketch_sql",
    "reg_bit_columns",
    "cm_sketch",
    "cm_estimate",
    "cm_sketch_sql",
    "bloom_build",
    "bloom_contains",
    "bloom_sql",
]

_PHI = 0.77351
# h64 is 60 bits; after dividing by n_regs (<= 2^12) at least ~48 bits
# remain, so an all-zero remainder is ~2^-48 — still guard it.
_RHO_CAP = 55


def reg_bit_columns(key_col: str, n_regs: int = 64):
    """(register, rank-bit) column pair for one key value — the
    columnar, JVM-side front half of the sketch, reusable by the
    streaming stateful operator (which only bit_ors the bits)."""
    bits = int(n_regs).bit_length() - 1
    if n_regs != 1 << bits:
        raise ValueError(f"n_regs must be a power of two: {n_regs}")
    h = h64(F.col(key_col).cast("string"))
    # shift/mask keep everything in exact 64-bit integer arithmetic —
    # h / n_regs through double division would be inexact past 2^53
    rest = F.shiftright(h, bits)
    low = rest.bitwiseAND(-rest)
    # lowest-set-bit position: log2(x & -x) is exact for powers of two
    rho = F.when(rest == 0, F.lit(_RHO_CAP)).otherwise(
        (F.floor(F.log2(low)) + F.lit(1)).cast("int")
    )
    # 1 << (rho-1) as pow(2, rho-1): powers of two are exact doubles
    bit = F.pow(F.lit(2.0), (rho - F.lit(1)).cast("double")).cast("long")
    return h.bitwiseAND(F.lit(n_regs - 1)), bit


def distinct_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    n_regs: int = 64,
) -> DataFrame:
    """Approximate distinct ``key_col`` per ``group_cols`` →
    ``(group_cols..., est_distinct double)``."""
    group_cols = list(group_cols)
    reg, bit = reg_bit_columns(key_col, n_regs)
    regs = (
        df.select(*group_cols, reg.alias("__reg"), bit.alias("__bit"))
        .groupBy(*group_cols, "__reg")
        .agg(F.bit_or("__bit").alias("__bm"))
    )
    # trailing-ones count of the rank bitmap = lowest unseen rank - 1;
    # ~B & (B+1) isolates the lowest zero bit (exact power of two).
    trail = F.floor(F.log2(F.expr("~__bm & (__bm + 1)")))
    est = (
        F.pow(F.lit(2.0), F.sum(trail) / F.lit(float(n_regs)))
        * F.lit(n_regs / _PHI)
    )
    return regs.groupBy(*group_cols).agg(est.alias("est_distinct"))


def distinct_sketch_sql(
    table: str,
    key_expr: str,
    group_cols: Sequence[str],
    n_regs: int = 64,
) -> str:
    """DuckDB rendering of :func:`distinct_sketch` (same hash, same
    register math, same estimator)."""
    gc = ", ".join(group_cols)
    bits = int(n_regs).bit_length() - 1
    if n_regs != 1 << bits:
        raise ValueError(f"n_regs must be a power of two: {n_regs}")
    h = h64_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
WITH r AS (
  SELECT {gc},
         (({h}) & {n_regs - 1}) AS reg,
         (({h}) >> {bits}) AS rest
  FROM {table}
), rr AS (
  SELECT {gc}, reg,
         bit_or(CAST(1 AS BIGINT) << (CASE WHEN rest = 0 THEN {_RHO_CAP}
                  ELSE CAST(floor(log2(rest & -rest)) AS INT) + 1
             END - 1)) AS bm
  FROM r GROUP BY ALL
)
SELECT {gc},
       pow(2.0, sum(floor(log2(~bm & (bm + 1)))) / {float(n_regs)})
         * {n_regs / _PHI} AS est_distinct
FROM rr GROUP BY ALL"""


# ---------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimation — the heavy-hitter companion to the FM cardinality sketch.
# All integer arithmetic (counters + shift/mask hashing), so the DuckDB
# oracle matches EXACTLY, not just to float rounding.
# ---------------------------------------------------------------------


def _cm_check(depth: int, width: int) -> int:
    bits = int(width).bit_length() - 1
    if width != 1 << bits:
        raise ValueError(f"width must be a power of two: {width}")
    if depth < 1:
        raise ValueError(f"depth must be >= 1: {depth}")
    return bits


def cm_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the d×w counter table → ``(row int, bucket int, cnt long)``
    (sparse: absent cells are 0).  One union of ``depth`` projections +
    one partial-agg groupBy — mergeable across shards/days by summing
    cnt on (row, bucket)."""
    _cm_check(depth, width)
    frames = []
    for i in range(depth):
        h = h64(F.col(key_col).cast("string"), salt=f"cm{i}|")
        frames.append(
            df.select(
                F.lit(i).alias("row"),
                h.bitwiseAND(F.lit(width - 1)).cast("int").alias("bucket"),
            )
        )
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    return u.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key's frequency: ``min_i cnt[i][h_i(key)]``
    (an upper bound on the true count; equality unless buckets collide).
    Equi-joins on (row, bucket) only — the sketch side is d×w rows and
    broadcasts."""
    _cm_check(depth, width)
    frames = []
    for i in range(depth):
        h = h64(F.col(key_col).cast("string"), salt=f"cm{i}|")
        frames.append(
            keys.select(
                key_col,
                F.lit(i).alias("row"),
                h.bitwiseAND(F.lit(width - 1)).cast("int").alias("bucket"),
            )
        )
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    return (
        u.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def cm_sketch_sql(
    table: str, key_expr: str, depth: int = 4, width: int = 256
) -> str:
    """DuckDB rendering of build + all-keys estimate over ``table``
    (same salts, same shift/mask bucketing, exact integer parity)."""
    _cm_check(depth, width)
    rows = []
    for i in range(depth):
        h = h64_sql(f"CAST({key_expr} AS VARCHAR)", salt=f"cm{i}|")
        rows.append(
            f"SELECT {i} AS row, (({h}) & {width - 1}) AS bucket "
            f"FROM {table}"
        )
    build = "\nUNION ALL\n".join(rows)
    probes = []
    for i in range(depth):
        h = h64_sql(f"CAST({key_expr} AS VARCHAR)", salt=f"cm{i}|")
        probes.append(
            f"SELECT {key_expr} AS k, {i} AS row, "
            f"(({h}) & {width - 1}) AS bucket FROM keys"
        )
    probe = "\nUNION ALL\n".join(probes)
    return f"""
WITH cm AS (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM ({build}) GROUP BY 1, 2
),
keys AS (SELECT DISTINCT {key_expr} FROM {table}),
pr AS ({probe})
SELECT pr.k, min(coalesce(cm.cnt, 0)) AS est_count
FROM pr LEFT JOIN cm USING (row, bucket)
GROUP BY 1"""


# ---------------------------------------------------------------------
# Bloom filter (Bloom 1970): portable membership sketch for semi-join
# pruning — the build side collapses to m/64 bitmap words, the probe is
# an equi-join on word index + a bit test, and false positives are a
# deterministic function of the md5 hashing, so the DuckDB oracle
# reproduces membership decisions (including the false positives)
# exactly.
# ---------------------------------------------------------------------


def _bloom_check(n_bits: int, n_hashes: int) -> int:
    bits = int(n_bits).bit_length() - 1
    if n_bits != 1 << bits:
        raise ValueError(f"n_bits must be a power of two: {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1: {n_hashes}")
    return bits


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Bitmap words ``(word int, bm long)`` — ``n_bits/64`` rows max,
    mergeable across shards by bit_or on word."""
    _bloom_check(n_bits, n_hashes)
    frames = []
    for i in range(n_hashes):
        h = h64(F.col(key_col).cast("string"), salt=f"bloom{i}|")
        pos = h.bitwiseAND(F.lit(n_bits - 1))
        # shiftleft, not pow-cast: bit 63 is the sign-bit pattern,
        # which a double->long cast cannot produce
        frames.append(
            keys.select(
                F.shiftright(pos, 6).cast("int").alias("word"),
                pos.bitwiseAND(F.lit(63)).cast("int").alias("__b"),
            ).select(
                "word",
                F.expr("shiftleft(CAST(1 AS BIGINT), __b)").alias("bit"),
            )
        )
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    return u.groupBy("word").agg(F.bit_or("bit").alias("bm"))


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
):
    """``(probes..., in_bloom int)`` — 1 iff every hash bit is set.
    The bloom side broadcasts (<= n_bits/64 rows)."""
    _bloom_check(n_bits, n_hashes)
    frames = []
    for i in range(n_hashes):
        h = h64(F.col(key_col).cast("string"), salt=f"bloom{i}|")
        pos = h.bitwiseAND(F.lit(n_bits - 1))
        frames.append(
            probes.select(
                key_col,
                F.shiftright(pos, 6).cast("int").alias("word"),
                pos.bitwiseAND(F.lit(63)).cast("int").alias("__b"),
            ).select(
                key_col,
                "word",
                F.expr("shiftleft(CAST(1 AS BIGINT), __b)").alias("bit"),
            )
        )
    u = frames[0]
    for fr in frames[1:]:
        u = u.unionByName(fr)
    hit = (
        F.col("bm").isNotNull()
        & (F.col("bm").bitwiseAND(F.col("bit")) == F.col("bit"))
    ).cast("int")
    return (
        u.join(F.broadcast(bloom), "word", "left")
        .select(key_col, hit.alias("__hit"))
        .groupBy(key_col)
        .agg(
            (F.min("__hit") == 1).cast("int").alias("in_bloom")
        )
    )


def bloom_sql(
    build_table: str,
    build_key: str,
    probe_table: str,
    probe_key: str,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> str:
    """DuckDB rendering: distinct probe keys + their in_bloom flag."""
    _bloom_check(n_bits, n_hashes)
    def _bit(h: str) -> str:
        # DuckDB raises on 1 << 63; the sign-bit word needs its literal
        # (CASE is lazy per row, so the shift never evaluates at 63)
        b = f"(({h}) & 63)"
        return (
            f"(CASE WHEN {b} = 63 "
            f"THEN CAST(-9223372036854775807 - 1 AS BIGINT) "
            f"ELSE (CAST(1 AS BIGINT) << {b}) END)"
        )

    builds, probes = [], []
    for i in range(n_hashes):
        hb = h64_sql(f"CAST({build_key} AS VARCHAR)", salt=f"bloom{i}|")
        builds.append(
            f"SELECT ((({hb}) & {n_bits - 1}) >> 6) AS word, "
            f"{_bit(hb)} AS bit "
            f"FROM {build_table}"
        )
        hp = h64_sql(f"CAST({probe_key} AS VARCHAR)", salt=f"bloom{i}|")
        probes.append(
            f"SELECT {probe_key} AS k, "
            f"((({hp}) & {n_bits - 1}) >> 6) AS word, "
            f"{_bit(hp)} AS bit "
            f"FROM (SELECT DISTINCT {probe_key} FROM {probe_table})"
        )
    build = "\nUNION ALL\n".join(builds)
    probe = "\nUNION ALL\n".join(probes)
    return f"""
WITH bl AS (
  SELECT word, bit_or(bit) AS bm FROM ({build}) GROUP BY 1
),
pr AS ({probe})
SELECT pr.k,
       CAST(min(CASE WHEN bl.bm IS NOT NULL
                      AND (bl.bm & pr.bit) = pr.bit
                     THEN 1 ELSE 0 END) AS INT) AS in_bloom
FROM pr LEFT JOIN bl USING (word)
GROUP BY 1"""


# ---------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007): stochastic-averaging cardinality
# sketch — the max-register successor to the PCSA/FM bitmap sketch
# above.  Register state is max(rho) per bucket (trivially mergeable);
# the harmonic mean's numerator Σ 2^(RHO_CAP - M_j) is kept as an exact
# BIGINT so both engines agree bit-for-bit before the one float
# division that produces the estimate.
# ---------------------------------------------------------------------


def _hll_rho(rest):
    """Lowest-set-bit position of the post-register hash bits (capped
    at _RHO_CAP for rest == 0) — same rank function as the FM sketch."""
    low = rest.bitwiseAND(-rest)
    return F.when(rest == 0, F.lit(_RHO_CAP)).otherwise(
        (F.floor(F.log2(low)) + F.lit(1)).cast("int")
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    n_regs: int = 64,
) -> DataFrame:
    """→ ``(group_cols..., reg, mj)``: the HLL register table.  Merging
    two sketches = unionByName + groupBy max — exercised by the pytest
    merge-equivalence check."""
    bits = int(n_regs).bit_length() - 1
    if n_regs != 1 << bits:
        raise ValueError(f"n_regs must be a power of two: {n_regs}")
    h = h64(F.col(key_col).cast("string"))
    rest = F.shiftright(h, bits)
    return (
        df.select(
            *group_cols,
            h.bitwiseAND(F.lit(n_regs - 1)).alias("reg"),
            _hll_rho(rest).alias("_rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").alias("mj"))
    )


def _hll_alpha_scale(n_regs: int) -> float:
    """alpha_m · m² · 2^RHO_CAP as one python double, embedded verbatim
    in both engines so the estimate expression is literally identical."""
    alpha = 0.7213 / (1.0 + 1.079 / n_regs)
    return alpha * n_regs * n_regs * float(2**_RHO_CAP)


def hll_estimate(
    registers: DataFrame,
    group_cols: Sequence[str],
    n_regs: int = 64,
) -> DataFrame:
    """Registers → ``(group_cols..., n_zero_regs, harmonic_e,
    est_distinct)``.

    ``harmonic_e = Σ_j 2^(RHO_CAP - M_j)`` over all ``n_regs`` registers
    (absent registers count ``2^RHO_CAP``) — exact BIGINT.  The estimate
    applies the standard small-range linear-counting correction when
    ``est_raw ≤ 2.5·m`` and zero registers remain.
    """
    group_cols = list(group_cols)
    m = int(n_regs)
    scale = _hll_alpha_scale(m)
    # 2^(cap-mj) is an exact power of two ≤ 2^54: exact in double, and
    # the cast back to long is exact — the sum is pure BIGINT.
    term = F.pow(
        F.lit(2.0), (F.lit(_RHO_CAP) - F.col("mj")).cast("double")
    ).cast("long")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_np"),
        F.sum(term).alias("_hp"),
    )
    harmonic = (
        F.col("_hp")
        + (F.lit(m) - F.col("_np")) * F.lit(int(2**_RHO_CAP))
    ).cast("long")
    v = (F.lit(m) - F.col("_np")).cast("long")
    est_raw = F.lit(scale) / F.col("harmonic_e")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (F.col("n_zero_regs") > 0),
        F.lit(float(m))
        * F.log(F.lit(float(m)) / F.col("n_zero_regs")),
    ).otherwise(est_raw)
    return agg.select(
        *group_cols,
        v.alias("n_zero_regs"),
        harmonic.alias("harmonic_e"),
    ).select(
        *group_cols,
        "n_zero_regs",
        "harmonic_e",
        F.round(est, 6).alias("est_distinct"),
    )


def hll_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    n_regs: int = 64,
) -> DataFrame:
    """Approximate distinct ``key_col`` per group via HyperLogLog."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, n_regs), group_cols, n_regs
    )


def hll_sketch_sql(
    table: str,
    key_expr: str,
    group_cols: Sequence[str],
    n_regs: int = 64,
) -> str:
    """DuckDB rendering of :func:`hll_sketch` (same hash, same register
    math, same literal alpha·m²·2^cap scale constant)."""
    gc = ", ".join(group_cols)
    bits = int(n_regs).bit_length() - 1
    if n_regs != 1 << bits:
        raise ValueError(f"n_regs must be a power of two: {n_regs}")
    m = int(n_regs)
    cap = _RHO_CAP
    scale = _hll_alpha_scale(m)
    h = h64_sql(f"CAST({key_expr} AS VARCHAR)")
    return f"""
WITH hr AS (
  SELECT {gc},
         (({h}) & {m - 1}) AS reg,
         (({h}) >> {bits}) AS rest
  FROM {table}
), hm AS (
  SELECT {gc}, reg,
         max(CASE WHEN rest = 0 THEN {cap}
                  ELSE CAST(floor(log2(rest & -rest)) AS INT) + 1
             END) AS mj
  FROM hr GROUP BY ALL
), ha AS (
  SELECT {gc},
         CAST({m} - count(*) AS BIGINT) AS n_zero_regs,
         CAST(sum(CAST(pow(2.0, {cap} - mj) AS BIGINT))
              + ({m} - count(*)) * {2 ** cap} AS BIGINT) AS harmonic_e
  FROM hm GROUP BY ALL
)
SELECT {gc}, n_zero_regs, harmonic_e,
       round(CASE WHEN {scale!r} / harmonic_e <= {2.5 * m}
                   AND n_zero_regs > 0
                  THEN {float(m)!r} * ln({float(m)!r} / n_zero_regs)
                  ELSE {scale!r} / harmonic_e
             END, 6) AS est_distinct
FROM ha"""
