"""ML sample prep + stratified split (ml_tasks_* analogs)."""

from pyspark.sql import functions as F

from unarxive_spark.operators.mltasks import (
    label_counts,
    prep_samples,
    split_distribution,
    stratified_split,
)


def test_prep_samples_renumbering(spark):
    rows = [
        ("a", 0, "user", "x" * 40 + " conv:b1 mid conv:c2 end conv:b1", ""),
        ("a", 1, "tool", "short", ""),
        ("b", 0, "assistant", "y" * 50 + " no refs", ""),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2025-01-01")))
    s = prep_samples(t, min_chars=40).collect()
    by_id = {r["_id"]: r for r in s}
    assert set(by_id) == {"a#0", "b#0"}  # short turn filtered
    # first-appearance renumbering: b1→[1], c2→[2], duplicate b1→[1]
    assert by_id["a#0"]["text"].endswith("[1] mid [2] end [1]")
    assert by_id["a#0"]["n_distinct_refs"] == 2
    assert by_id["b#0"]["text"].endswith(" no refs")  # untouched
    assert by_id["b#0"]["n_distinct_refs"] == 0


def test_stratified_split(spark, transcripts_small):
    samples = prep_samples(transcripts_small, min_chars=10).cache()
    split = stratified_split(samples, train=0.8, dev=0.1, seed=42).cache()
    # split is a partition of the samples
    assert split.count() == samples.count()
    dist = {
        (r["label"], r["split"]): r["share"]
        for r in split_distribution(split).collect()
    }
    for label in {k[0] for k in dist}:
        assert 0.7 < dist.get((label, "train"), 0) < 0.9, (label, dist)
    # deterministic across recomputation
    s2 = stratified_split(samples, train=0.8, dev=0.1, seed=42)
    assert split.select("_id", "split").exceptAll(
        s2.select("_id", "split")
    ).count() == 0
    # different seed → different assignment
    s3 = stratified_split(samples, seed=7)
    assert (
        split.select("_id", "split")
        .exceptAll(s3.select("_id", "split"))
        .count()
        > 0
    )


def test_label_counts_threshold(spark, transcripts_small):
    samples = prep_samples(transcripts_small, min_chars=10)
    lc = {r["label"]: r["n_convs"] for r in label_counts(samples).collect()}
    assert set(lc) == {"user", "assistant", "tool"}
    assert all(v >= 3 for v in lc.values())


# ---------------- proportional-minima split ----------------


def test_stratified_minima_exact_allocation(spark):
    """Every (month, label) stratum contributes EXACTLY ceil(N*share)
    rows to dev and test — including the N=1 and N=7 rare strata the
    hash-bucket split can starve (ml_tasks_split_data.py:155-171)."""
    import math

    from unarxive_spark.operators.mltasks import stratified_split_minima

    rows = []
    # skewed strata: 1000 / 40 / 7 / 1 rows
    for i in range(1000):
        rows.append((f"id{i:05d}", "2024-01", "big"))
    for i in range(40):
        rows.append((f"md{i:05d}", "2024-01", "mid"))
    for i in range(7):
        rows.append((f"rr{i:05d}", "2024-02", "rare"))
    rows.append(("solo0", "2024-02", "solo"))
    df = spark.createDataFrame(rows, "_id string, month string, label string")
    out = stratified_split_minima(
        df, strata_cols=("month", "label"), train=0.8, dev=0.1
    )
    got = {
        (r["month"], r["label"], r["split"]): r["n"]
        for r in out.groupBy("month", "label", "split")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for month, label, n in [
        ("2024-01", "big", 1000),
        ("2024-01", "mid", 40),
        ("2024-02", "rare", 7),
        ("2024-02", "solo", 1),
    ]:
        n_dev = math.ceil(n * 0.1)
        n_test = min(math.ceil(n * 0.1), n - n_dev)
        assert got.get((month, label, "dev"), 0) == n_dev, (label, got)
        assert got.get((month, label, "test"), 0) == n_test, (label, got)
        assert (
            got.get((month, label, "train"), 0) == n - n_dev - n_test
        ), (label, got)


def test_stratified_minima_deterministic_across_partitioning(spark):
    from unarxive_spark.operators.mltasks import stratified_split_minima

    rows = [(f"id{i:04d}", "m", "l" + str(i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "_id string, month string, label string")
    a = sorted(
        map(
            tuple,
            stratified_split_minima(df, ("label",)).select("_id", "split").collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            stratified_split_minima(df.repartition(13), ("label",))
            .select("_id", "split")
            .collect(),
        )
    )
    assert a == b


def test_priority_sample_matches_plain_bottom_k(spark):
    """Two-stage de-skewed sample == plain per-group bottom-k by
    (h64(key), key); deterministic across reruns."""
    import hashlib

    from unarxive_spark.operators.mltasks import priority_sample

    rows = [(g, i) for g in ("x", "y") for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, key long")

    def h(s):
        return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)

    want = {
        g: sorted(
            (i for gg, i in rows if gg == g),
            key=lambda i: (h(i), i),
        )[:5]
        for g in ("x", "y")
    }
    got = {}
    for r in priority_sample(df, 5, ["grp"], "key").collect():
        got.setdefault(r["grp"], []).append(r["key"])
    assert {g: sorted(v) for g, v in got.items()} == {
        g: sorted(v) for g, v in want.items()
    }
    rerun = {}
    for r in priority_sample(df, 5, ["grp"], "key").collect():
        rerun.setdefault(r["grp"], []).append(r["key"])
    assert {g: sorted(v) for g, v in rerun.items()} == {
        g: sorted(v) for g, v in got.items()
    }


def test_weighted_priority_sample_matches_replay_and_skew(spark):
    """E-S weighted sample == python replay of the min-replicated-hash
    key, and a heavy-weight key dominates the sample (the verdict's
    skew fixture): one item with weight 32 among 50 weight-1 items must
    be picked into a k=5 sample under this seedless deterministic
    scheme iff its min draw is among the 5 smallest — replayed exactly."""
    import hashlib

    from unarxive_spark.operators.mltasks import weighted_priority_sample

    def h(s):
        return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)

    def key(i, w):
        return min(h(f"{i}#{j}") for j in range(w))

    rows = [("g", i, 1) for i in range(50)] + [("g", 999, 32)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    want = sorted(
        ((i, w) for _, i, w in rows), key=lambda t: (key(*t), t[0])
    )[:5]
    got = sorted(
        (r["id"], r["w"])
        for r in weighted_priority_sample(
            df, 5, ["grp"], "id", "w", max_weight=32
        ).collect()
    )
    assert got == sorted(want)
    # weight-proportional pull: the weight-32 item holds 32 of the 82
    # draws — with this fixture's hashes it must land in the sample
    # (pin it so the weighting is demonstrably doing something)
    assert any(i == 999 for i, _ in got)


def test_weighted_priority_sample_rejects_bad_weights(spark):
    import pytest as _pytest

    from unarxive_spark.operators.mltasks import weighted_priority_sample

    df = spark.createDataFrame(
        [("g", 1, 0)], "grp string, id long, w long"
    )
    with _pytest.raises(Exception, match="weights must be integers"):
        weighted_priority_sample(df, 2, ["grp"], "id", "w").collect()
    df2 = spark.createDataFrame(
        [("g", 1, 5000)], "grp string, id long, w long"
    )
    with _pytest.raises(Exception, match="weights must be integers"):
        weighted_priority_sample(df2, 2, ["grp"], "id", "w").collect()


def test_mixture_sample_exact_allocation(spark):
    """n_copies replayed in pure Python over the canonical
    (shard, h64, id) order; realized counts hit ⌊w⌋·N + ⌈frac·N⌉
    exactly per domain."""
    import hashlib

    from unarxive_spark.operators.mltasks import mixture_sample

    rows = [(f"d{i:03d}", f"dom{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    weights = {"dom0": 250, "dom1": 1500, "dom2": 3400, "dom3": 0}
    got = {
        r["doc_id"]: (r["source"], r["n_copies"])
        for r in mixture_sample(df, weights, n_shards=8).collect()
    }
    assert len(got) == 200

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for dom in sorted({d for _, d in rows}):
        members = sorted(
            (i for i, d in rows if d == dom),
            key=lambda i: (h(i) % 8, h(i), i),
        )
        pm = weights.get(dom, 1000)
        n = len(members)
        extra = ((pm % 1000) * n + 999) // 1000
        for rk, i in enumerate(members, 1):
            want[i] = (dom, pm // 1000 + (1 if rk <= extra else 0))
    assert got == want
    # realized totals are the exact target allocation
    for dom, pm in weights.items():
        n = sum(1 for _, d in rows if d == dom)
        realized = sum(c for d, c in got.values() if d == dom)
        assert realized == (pm // 1000) * n + ((pm % 1000) * n + 999) // 1000
    # regimes: dom3 fully dropped, dom2 has 3- and 4-copy docs
    assert {c for d, c in got.values() if d == "dom3"} == {0}
    assert {c for d, c in got.values() if d == "dom2"} == {3, 4}


def test_mixture_sample_default_weight_and_validation(spark):
    import pytest as _pytest

    from unarxive_spark.operators.mltasks import mixture_sample

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "doc_id string, source string"
    )
    got = {
        r["doc_id"]: r["n_copies"]
        for r in mixture_sample(df, {"x": 2000}).collect()
    }
    assert got == {"a": 2, "b": 1}  # unlisted domain y defaults to 1000
    with _pytest.raises(ValueError, match="non-negative"):
        mixture_sample(df, {"x": -5})


def test_negative_edge_samples_are_non_adjacent_and_deterministic(spark):
    from unarxive_spark.operators.mltasks import negative_edge_samples

    rows = [
        (f"c{i:03d}", f"c{(i * 7 + 1) % 40:03d}", 1.0) for i in range(40)
    ]
    e = spark.createDataFrame(
        rows, "src_conv_id string, dst_conv_id string, weight double"
    )
    adj = {(a, b) for a, b, _ in rows} | {(b, a) for a, b, _ in rows}
    out1 = {
        (r.src_conv_id, r.dst_conv_id, r.sample_idx)
        for r in negative_edge_samples(e, k=3, n_buckets=8).collect()
    }
    # no sampled pair may be adjacent (either direction) or a self-loop
    for a, b, _ in out1:
        assert (a, b) not in adj and a != b
    # re-run is bit-identical (reproducible training data)
    out2 = {
        (r.src_conv_id, r.dst_conv_id, r.sample_idx)
        for r in negative_edge_samples(e, k=3, n_buckets=8).collect()
    }
    assert out1 == out2
    # the draw actually produces work: most vertices get >= 1 negative
    assert len({a for a, _, _ in out1}) >= 30


def test_negative_edge_samples_contract_errors(spark):
    import pytest as _pytest

    from unarxive_spark.operators.mltasks import negative_edge_samples

    e = spark.createDataFrame(
        [("a", "b", 1.0)],
        "src_conv_id string, dst_conv_id string, weight double",
    )
    with _pytest.raises(ValueError):
        negative_edge_samples(e, k=0)
    with _pytest.raises(ValueError):
        negative_edge_samples(e, n_buckets=0)


def _brute_auc(edge_rows, neg_pairs, max_degree=100):
    """Independent python AUC: brute AA scores + pairwise rank stat."""
    import math

    und = {(u, v) for u, v in edge_rows if u != v}
    und |= {(v, u) for u, v in und}
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
    kept = {u for u, ns in nbr.items() if len(ns) <= max_degree}
    w = {
        u: round(1e9 / math.log(len(nbr[u])))
        for u in kept
        if len(nbr[u]) >= 2
    }

    def score(a, b):
        common = (nbr.get(a, set()) & nbr.get(b, set())) & set(w)
        return sum(w[u] for u in common)

    pos = {(min(u, v), max(u, v)) for u, v in edge_rows if u != v}
    ps = [score(a, b) for a, b in pos]
    ns_ = [score(a, b) for a, b in neg_pairs]
    u2 = sum(
        2 * sum(1 for n in ns_ if n < p) + sum(1 for n in ns_ if n == p)
        for p in ps
    )
    den = 2 * len(ps) * len(ns_)
    return (
        len(ps),
        len(ns_),
        u2,
        (1_000_000 * u2 + len(ps) * len(ns_)) // den,
    )


def test_link_prediction_auc_matches_brute_force(spark):
    import random

    from unarxive_spark.operators.mltasks import (
        link_prediction_auc,
        negative_edge_samples,
    )

    rng = random.Random(5)
    rows = list(
        {
            (f"v{rng.randrange(30)}", f"v{rng.randrange(30)}")
            for _ in range(120)
        }
    )
    rows = [(u, v) for u, v in rows if u != v]
    e = spark.createDataFrame(rows, "src_conv_id string, dst_conv_id string")
    neg = {
        (min(r.src_conv_id, r.dst_conv_id), max(r.src_conv_id, r.dst_conv_id))
        for r in negative_edge_samples(e, k=2, n_buckets=8).collect()
    }
    got = link_prediction_auc(e, k_negatives=2, n_buckets=8).collect()[0]
    assert (
        got.n_pos,
        got.n_neg,
        got.u2,
        got.auc_e6,
    ) == _brute_auc(rows, neg)


def test_link_prediction_auc_separates_planted_cliques(spark):
    from unarxive_spark.operators.mltasks import link_prediction_auc

    # two 8-cliques: real edges have many common neighbors (high AA);
    # the sampled cross/non-edges have none -> AUC must be high
    clique = lambda p, n: [  # noqa: E731
        (f"{p}{i}", f"{p}{j}") for i in range(n) for j in range(i + 1, n)
    ]
    rows = clique("a", 8) + clique("b", 8)
    e = spark.createDataFrame(rows, "src_conv_id string, dst_conv_id string")
    got = link_prediction_auc(e, k_negatives=3, n_buckets=4).collect()[0]
    assert got.n_pos == 56 and got.n_neg > 0
    assert got.auc_e6 >= 900_000
