"""FM/PCSA distinct sketch: exact python replay + accuracy envelope."""

import hashlib

import pytest

from unarxive_spark.operators.sketch import _PHI, _RHO_CAP, distinct_sketch


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _oracle(keys, n_regs=64):
    B = [0] * n_regs
    for k in keys:
        h = _h64(str(k))
        reg, rest = h & (n_regs - 1), h >> (n_regs.bit_length() - 1)
        rho = _RHO_CAP if rest == 0 else (rest & -rest).bit_length()
        B[reg] |= 1 << (rho - 1)
    # trailing-ones of each rank bitmap
    R = [(~b & (b + 1)).bit_length() - 1 for b in B]
    return 2.0 ** (sum(R) / n_regs) * n_regs / _PHI


def test_sketch_matches_python_replay(spark):
    rows = [(i % 3, f"k{i % 500}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, key string")
    got = {
        r.g: r.est_distinct
        for r in distinct_sketch(df, "key", ["g"]).collect()
    }
    for g in (0, 1, 2):
        keys = {k for gg, k in rows if gg == g}
        assert got[g] == pytest.approx(_oracle(keys), rel=1e-12), g


def test_sketch_accuracy_envelope(spark):
    n = 5000
    df = spark.createDataFrame(
        [(0, f"user-{i}") for i in range(n)], "g int, key string"
    )
    [row] = distinct_sketch(df, "key", ["g"]).collect()
    # PCSA stderr ~ 0.78/sqrt(64) ≈ 10%; allow a generous 3-sigma band
    assert n * 0.7 < row.est_distinct < n * 1.3


def test_sketch_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([(0, "a")], "g int, key string")
    with pytest.raises(ValueError, match="power of two"):
        distinct_sketch(df, "key", ["g"], n_regs=48)


def test_cm_sketch_bounds_and_replay(spark):
    from collections import Counter

    from unarxive_spark.operators.sketch import cm_estimate, cm_sketch

    # zipf-ish frequencies
    rows = [(f"k{i % (j + 1)}",) for j in range(60) for i in range(j + 1)]
    df = spark.createDataFrame(rows, "key string")
    true = Counter(k for (k,) in rows)

    sk = cm_sketch(df, "key", depth=4, width=256)
    keys = spark.createDataFrame(
        [(k,) for k in true], "key string"
    )
    got = {
        r.key: r.est_count
        for r in cm_estimate(sk, keys, "key", depth=4, width=256).collect()
    }
    assert got.keys() == true.keys()
    # CM never under-counts
    assert all(got[k] >= true[k] for k in true)
    # python replay: identical hashing -> identical counters
    W, D = 256, 4
    counters = [[0] * W for _ in range(D)]
    for (k,) in rows:
        for i in range(D):
            counters[i][_h64(f"cm{i}|{k}") & (W - 1)] += 1
    want = {
        k: min(counters[i][_h64(f"cm{i}|{k}") & (W - 1)] for i in range(D))
        for k in true
    }
    assert got == want
    # with 60 keys in 256 buckets most estimates are exact
    exact = sum(got[k] == true[k] for k in true)
    assert exact >= 0.8 * len(true)


def test_cm_sketch_rejects_bad_params(spark):
    from unarxive_spark.operators.sketch import cm_sketch

    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="power of two"):
        cm_sketch(df, "key", width=100)
    with pytest.raises(ValueError, match="depth"):
        cm_sketch(df, "key", depth=0)


def test_bloom_filter_membership(spark):
    from unarxive_spark.operators.sketch import bloom_build, bloom_contains

    build = spark.createDataFrame(
        [(f"in{i}",) for i in range(200)], "key string"
    )
    probe = spark.createDataFrame(
        [(f"in{i}",) for i in range(200)]
        + [(f"out{i}",) for i in range(400)],
        "key string",
    )
    bl = bloom_build(build, "key")
    got = {
        r.key: r.in_bloom
        for r in bloom_contains(bl, probe, "key").collect()
    }
    # no false negatives, ever
    assert all(got[f"in{i}"] == 1 for i in range(200))
    # python replay: identical bit math -> identical decisions
    # (including whichever false positives the hashing produces)
    M, K = 4096, 4
    words = {}
    for i in range(200):
        for j in range(K):
            pos = _h64(f"bloom{j}|in{i}") & (M - 1)
            words[pos >> 6] = words.get(pos >> 6, 0) | (1 << (pos & 63))
    def member(k):
        for j in range(K):
            pos = _h64(f"bloom{j}|{k}") & (M - 1)
            if not (words.get(pos >> 6, 0) >> (pos & 63)) & 1:
                return 0
        return 1
    assert got == {k: member(k) for k in got}
    # the filter actually prunes: most outsiders rejected
    fp = sum(got[f"out{i}"] for i in range(400))
    assert fp < 40  # ~ (1 - e^-kn/m)^k << 10% here


# ---------------------------------------------------------------------
# HyperLogLog (q116 machinery)
# ---------------------------------------------------------------------


def test_hll_accuracy_envelope(spark):
    from unarxive_spark.operators.sketch import hll_sketch

    n = 5000
    df = spark.range(n).selectExpr(
        "CAST(id % 2 AS STRING) AS g", "id AS k"
    )
    out = {r.g: r for r in hll_sketch(df, "k", ["g"]).collect()}
    for g, true in (("0", n // 2), ("1", n // 2)):
        # m=64 -> relative std error 1.04/sqrt(64) = 13%; 3 sigma = 39%
        assert abs(out[g].est_distinct - true) / true < 0.39


def test_hll_linear_counting_small_range(spark):
    import math

    from unarxive_spark.operators.sketch import hll_sketch

    df = spark.range(10).selectExpr("'a' AS g", "id AS k")
    row = hll_sketch(df, "k", ["g"]).collect()[0]
    # 10 distinct over 64 registers: small-range branch must fire
    assert row.n_zero_regs > 0
    want = 64.0 * math.log(64.0 / row.n_zero_regs)
    assert row.est_distinct == round(want, 6)
    assert abs(row.est_distinct - 10) < 4


def test_hll_merge_equals_one_shot(spark):
    from unarxive_spark.operators.sketch import hll_estimate, hll_registers
    from pyspark.sql import functions as F

    df = spark.range(2000).selectExpr("'a' AS g", "id AS k")
    left = hll_registers(df.filter("k < 1200"), "k", ["g"])
    right = hll_registers(df.filter("k >= 800"), "k", ["g"])  # overlap
    merged = (
        left.unionByName(right)
        .groupBy("g", "reg")
        .agg(F.max("mj").alias("mj"))
    )
    one_shot = hll_estimate(hll_registers(df, "k", ["g"]), ["g"]).collect()[0]
    via_merge = hll_estimate(merged, ["g"]).collect()[0]
    # register-exact merge: identical BIGINT numerator and estimate
    assert via_merge.harmonic_e == one_shot.harmonic_e
    assert via_merge.est_distinct == one_shot.est_distinct


def test_hll_rejects_non_power_of_two_registers(spark):
    import pytest as _pytest

    from unarxive_spark.operators.sketch import hll_registers, hll_sketch_sql

    df = spark.range(4).selectExpr("'a' AS g", "id AS k")
    with _pytest.raises(ValueError):
        hll_registers(df, "k", ["g"], n_regs=48)
    with _pytest.raises(ValueError):
        hll_sketch_sql("t", "k", ["g"], n_regs=48)
