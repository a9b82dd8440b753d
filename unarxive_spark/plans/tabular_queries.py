"""Tabular driver-contract queries: classic relational surface (agg /
join / window / anti-join / argmax — SURVEY.md §2.2-2.7 analogs) over the
TPC-H-ish tables, plus the training-data ops (dedup, similarity, text
analysis) over documents/embeddings, each with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64, h64_sql
from unarxive_spark.functions.texttools import (
    bpe_ish_token_count,
    fingerprint,
    fingerprint_sql,
    lang_id,
    lang_id_sql,
    quality_score,
    quality_score_sql,
    token_count,
    token_count_sql,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------
# Relational surface
# ---------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shape aggregation (A2-style metric block; pushdown-able
    date predicate, map-side partial agg)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("sum_qty", 4).alias("sum_qty"),
            F.round("sum_base_price", 4).alias("sum_base_price"),
            F.round("sum_disc_price", 4).alias("sum_disc_price"),
            "avg_qty",
            "avg_disc",
            "count_order",
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY 1, 2"""


def q_revenue_by_nation(spark, sf_dir):
    """3-way join (fact ⋈ dims) + agg — broadcast dims (J1/J2 analog)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name, round(sum(o_totalprice), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1"""


def q_top_orders_per_customer(spark, sf_dir):
    """Window top-k per group (§2.5: row_number pattern)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOP_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3"""


def q_customers_without_open_orders(spark, sf_dir):
    """Anti-join (J8 resume analog: skip members of a done-set)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter("o_orderstatus = 'O'")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_CUSTOMERS_WITHOUT_OPEN_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')"""


def q_richest_supplier_per_nation(spark, sf_dir):
    """Argmax-per-group (A7: max_by citation_count analog)."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal")
    )


SQL_RICHEST_SUPPLIER_PER_NATION = """
SELECT s_nationkey, s_suppkey, s_name, s_acctbal
FROM (
  SELECT *, row_number() OVER (PARTITION BY s_nationkey
                               ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
  FROM supplier
) WHERE rn = 1"""


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) — the batch analog of
    a session window (SURVEY.md §2.9: the graft is batch-iterative)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(
        F.lag("ts").over(w)
    )
    sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )


SQL_SESSIONIZE_EVENTS = """
SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS session_value
FROM (
  SELECT user_id, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM (
    SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                   THEN 1 ELSE 0 END AS new_sess
    FROM events
  )
)
GROUP BY 1, 2"""


def q_hourly_event_counts(spark, sf_dir):
    """Tumbling-window rollup over event time (streaming-shaped agg run
    in batch; same plan a Structured Streaming sink would produce)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


SQL_HOURLY_EVENT_COUNTS = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2"""


# ---------------------------------------------------------------------
# Training-data ops: text analysis
# ---------------------------------------------------------------------


def q_text_features(spark, sf_dir):
    """Token counts + quality + language ID per document (P19-P22
    analogs)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        bpe_ish_token_count("text").cast("long").alias("n_bpe_tokens"),
        F.round(quality_score("text"), 6).alias("quality"),
        lang_id("text").alias("lang_pred"),
    )


SQL_TEXT_FEATURES = f"""
SELECT doc_id,
       CAST({token_count_sql('text')} AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
       round({quality_score_sql('text')}, 6) AS quality,
       {lang_id_sql('text')} AS lang_pred
FROM documents"""


def q_lang_quality_histogram(spark, sf_dir):
    """Histogram + avg quality per declared lang (A6 + A5 analog)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(quality_score("text")), 6).alias("avg_quality"),
    )


SQL_LANG_QUALITY_HISTOGRAM = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg({quality_score_sql('text')}), 6) AS avg_quality
FROM documents GROUP BY 1"""


def q_fingerprints(spark, sf_dir):
    """Document fingerprint (min 3-gram hash signature)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fp"))


SQL_FINGERPRINTS = f"""
SELECT doc_id, {fingerprint_sql('text')} AS fp FROM documents"""


# ---------------------------------------------------------------------
# Training-data ops: dedup + similarity
# ---------------------------------------------------------------------


def q_exact_dup_stats(spark, sf_dir):
    """Exact-dup groups by normalized text hash (P10/P26 analog)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
    return (
        d.select(h64(norm).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("representative"),
        )
    )


_NORM_SQL = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
SQL_EXACT_DUP_STATS = f"""
SELECT {h64_sql(_NORM_SQL)} AS text_hash,
       CAST(count(*) AS BIGINT) AS n_dups,
       min(doc_id) AS representative
FROM documents GROUP BY 1"""


N_PERM = 4


def q_minhash(spark, sf_dir):
    """MinHash signature slots as columns (portable md5 permutations)."""
    from unarxive_spark.operators.dedup import minhash_signature

    d = _t(spark, sf_dir, "documents")
    sig = minhash_signature(d, n_perm=N_PERM)
    return sig.select(
        F.col("id").alias("doc_id"),
        *[F.col("sig")[p].alias(f"mh{p}") for p in range(N_PERM)],
    )


def _shingles_sql(expr: str) -> str:
    toks = (
        f"list_filter(string_split_regex(trim(lower({expr})), '\\s+'),"
        " t -> t != '')"
    )
    return (
        f"CASE WHEN len({toks}) < 3 THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_distinct([array_to_string({toks}[i:i+2], ' ') "
        f"FOR i IN range(1, len({toks}) - 1)]) END"
    )


def _mh_sql(expr: str, p: int) -> str:
    return (
        f"list_min(list_transform({_shingles_sql(expr)}, "
        f"g -> CAST(('0x' || substr(md5('mh{p}|' || g), 1, 15)) AS BIGINT)))"
    )


SQL_MINHASH = (
    "SELECT doc_id, "
    + ", ".join(f"{_mh_sql('text', p)} AS mh{p}" for p in range(N_PERM))
    + " FROM documents"
)


SIMHASH_BITS = 16


def q_simhash(spark, sf_dir):
    """SimHash signature (16-bit) per document."""
    from unarxive_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    return simhash(d, bits=SIMHASH_BITS).select(
        F.col("id").alias("doc_id"), F.col("simhash")
    )


def _simhash_sql(expr: str, bits: int) -> str:
    toks = (
        f"list_filter(string_split_regex(trim(lower({expr})), '\\s+'),"
        " t -> t != '')"
    )
    h = "CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)"
    terms = []
    for b in range(bits):
        tally = (
            f"list_sum(list_transform({toks}, "
            f"t -> CASE WHEN (({h} >> {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(
            f"CASE WHEN COALESCE({tally}, 0) > 0 "
            f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


SQL_SIMHASH = (
    f"SELECT doc_id, {_simhash_sql('text', SIMHASH_BITS)} AS simhash "
    "FROM documents"
)


JACCARD_THRESHOLD = 0.2


def q_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (inverted-index join with the
    lossless length filter — t·|A| ≤ |B| ≤ |A|/t folded into the
    candidate join; identical results to the unfiltered join, which the
    oracle SQL computes).

    Stays length-only: the PPJoin prefix+positional path was re-measured
    at the bench corpus (sf0.1, round 4): 5.8 s vs 7.5-8.3 s warm — the
    prefix's extra ranked-posting build doesn't pay until collision
    density is far higher (bench.py records both each round as
    ``jaccard_length_only`` / ``jaccard_prefix_positional``)."""
    from unarxive_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    p = ngram_jaccard_pairs(
        d, threshold=JACCARD_THRESHOLD, length_filter=True
    )
    return p.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_JACCARD_PAIRS = f"""
WITH sh AS (
  SELECT DISTINCT doc_id AS id, unnest({_shingles_sql('text')}) AS shingle
  FROM documents
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT l.id AS id_a, r.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.id < r.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared), 6)
         AS jaccard
FROM shared
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
      >= {JACCARD_THRESHOLD}"""


def q_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for the first 3 vectors as queries."""
    from unarxive_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = cosine_topk(emb, queries, k=5)
    return out.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    )


SQL_COSINE_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
  FROM embeddings WHERE vec_id < 3
),
c AS (
  SELECT vec_id AS id, embedding AS vec,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
  WHERE sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
),
scored AS (
  SELECT query_id, id,
         list_sum(list_transform(range(1, len(vec) + 1),
             i -> CAST(vec[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))
           / (norm * qnorm) AS cosine
  FROM c CROSS JOIN q
)
SELECT query_id, id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, id ASC) AS rank
  FROM scored
) WHERE rank <= 5"""


LSH_PLANES = 12
LSH_SEED = 42
LSH_PROBE_HAMMING = 2


def q_lsh_ann(spark, sf_dir):
    """Multi-probe hyperplane-LSH ANN top-5 (the similarity-search scale
    path: query explodes into its hamming-ball probe buckets, equi-join
    on bucket, exact cosine re-rank inside). The hyperplanes are
    md5-derived ±1 patterns, so the ENTIRE approximate pipeline —
    sketch bits, probe-bucket enumeration, candidate set, re-rank — is
    reproduced bit-for-bit by the DuckDB oracle."""
    from unarxive_spark.operators.similarity import lsh_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = lsh_ann_topk(
        emb,
        queries,
        k=5,
        n_planes=LSH_PLANES,
        dim=64,
        probe_hamming=LSH_PROBE_HAMMING,
    )
    return out.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    )


# the ±1 hyperplane pattern: sign from md5('seed|p|j') first 8 hex
# digits, even → +1 (identical derivation to
# operators.similarity.hyperplane_sketch); list(s ORDER BY j) keeps the
# dot-product fold order identical to Spark's zip_with/aggregate.
SQL_LSH_ANN = f"""
WITH planes AS (
  SELECT p.range AS p, j.range AS j,
         CASE WHEN CAST(('0x' || substr(
                md5('{LSH_SEED}|' || p.range || '|' || j.range), 1, 8))
              AS BIGINT) % 2 = 0
              THEN 1e0 ELSE -1e0 END AS s
  FROM range({LSH_PLANES}) p, range(64) j
),
pvec AS (SELECT p, list(s ORDER BY j) AS svec FROM planes GROUP BY p),
c AS (
  SELECT vec_id AS id, embedding AS vec,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
  WHERE sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
),
cproj AS (
  SELECT c.id, sv.p,
         list_sum(list_transform(range(1, len(c.vec) + 1),
            i -> CAST(c.vec[i] AS DOUBLE) * sv.svec[i])) AS pr
  FROM c CROSS JOIN pvec sv
),
csk AS (
  SELECT id, CAST(SUM(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p
                           ELSE 0 END) AS BIGINT) AS bucket
  FROM cproj GROUP BY id
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
  FROM embeddings WHERE vec_id < 3
),
qproj AS (
  SELECT q.query_id, sv.p,
         list_sum(list_transform(range(1, len(q.qv) + 1),
            i -> CAST(q.qv[i] AS DOUBLE) * sv.svec[i])) AS pr
  FROM q CROSS JOIN pvec sv
),
qsk AS (
  SELECT query_id, CAST(SUM(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p
                                 ELSE 0 END) AS BIGINT) AS qbucket
  FROM qproj GROUP BY query_id
),
masks AS (
  SELECT CAST(0 AS BIGINT) AS m
  UNION ALL
  SELECT CAST(1 AS BIGINT) << a.range FROM range({LSH_PLANES}) a
  UNION ALL
  SELECT (CAST(1 AS BIGINT) << a.range) | (CAST(1 AS BIGINT) << b.range)
  FROM range({LSH_PLANES}) a, range({LSH_PLANES}) b
  WHERE a.range < b.range
),
probes AS (
  SELECT s.query_id, xor(s.qbucket, masks.m) AS bucket
  FROM qsk s CROSS JOIN masks
),
cands AS (
  SELECT p.query_id, k.id
  FROM probes p JOIN csk k ON k.bucket = p.bucket
),
scored AS (
  SELECT cd.query_id, cd.id,
         list_sum(list_transform(range(1, len(c.vec) + 1),
             i -> CAST(c.vec[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
           / (c.norm * q.qnorm) AS cosine
  FROM cands cd
  JOIN c ON c.id = cd.id
  JOIN q ON q.query_id = cd.query_id
)
SELECT query_id, id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, id ASC) AS rank
  FROM scored
) WHERE rank <= 5"""


IVF_CENTROIDS = 8
IVF_PROBE = 3


def q_ivf_ann(spark, sf_dir):
    """IVF ANN top-5: deterministic lowest-id centroid init
    (lloyd_iters=0 — no float averaging, so assignment/probe/re-rank
    are bit-for-bit reproducible), nearest-3-list probe, exact cosine
    re-rank inside the probed inverted lists. The Lloyd-refined and
    persisted/partition-pruned variants are pinned by
    tests/test_similarity.py (recall + PartitionFilters plan tests)."""
    from unarxive_spark.operators.similarity import ivf_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_ann_topk(
        emb,
        queries,
        k=5,
        n_centroids=IVF_CENTROIDS,
        n_probe=IVF_PROBE,
        dim=64,
        lloyd_iters=0,
    )
    return out.select(
        "query_id", "id", F.round("cosine", 6).alias("cosine"), "rank"
    )


SQL_IVF_ANN = f"""
WITH c AS (
  SELECT vec_id AS id, embedding AS vec,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
  WHERE sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
),
cent AS (
  SELECT row_number() OVER (ORDER BY id) AS centroid_id,
         vec AS cvec, norm AS cnorm
  FROM (SELECT id, vec, norm FROM c ORDER BY id LIMIT {IVF_CENTROIDS})
),
asg AS (
  SELECT id, vec, norm, centroid_id FROM (
    SELECT c.id, c.vec, c.norm, cent.centroid_id,
           row_number() OVER (PARTITION BY c.id ORDER BY
             (list_sum(list_transform(range(1, len(c.vec) + 1),
                i -> CAST(c.vec[i] AS DOUBLE) * CAST(cent.cvec[i] AS DOUBLE)))
              / (c.norm * cent.cnorm)) DESC,
             cent.centroid_id ASC) AS rn
    FROM c CROSS JOIN cent
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
  FROM embeddings WHERE vec_id < 3
),
probes AS (
  SELECT query_id, qv, qnorm, centroid_id FROM (
    SELECT q.query_id, q.qv, q.qnorm, cent.centroid_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             (list_sum(list_transform(range(1, len(q.qv) + 1),
                i -> CAST(q.qv[i] AS DOUBLE) * CAST(cent.cvec[i] AS DOUBLE)))
              / (q.qnorm * cent.cnorm)) DESC,
             cent.centroid_id ASC) AS rn
    FROM q CROSS JOIN cent
  ) WHERE rn <= {IVF_PROBE}
),
scored AS (
  SELECT p.query_id, a.id,
         list_sum(list_transform(range(1, len(a.vec) + 1),
             i -> CAST(a.vec[i] AS DOUBLE) * CAST(p.qv[i] AS DOUBLE)))
           / (a.norm * p.qnorm) AS cosine
  FROM probes p JOIN asg a USING (centroid_id)
)
SELECT query_id, id, round(cosine, 6) AS cosine, CAST(rank AS INT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, id ASC) AS rank
  FROM scored
) WHERE rank <= 5"""


NNDESC_K = 3
NNDESC_ROUNDS = 2
NNDESC_SHARDS = 16
NNDESC_PLANES = 12
NNDESC_SEED = 42


def q_nn_descent(spark, sf_dir):
    """Graph-based ANN: NN-Descent kNN-graph construction
    (operators/similarity.py nn_descent) — the join-expressible
    counterpart of HNSW.  LSH-bucket-ordered circular init, two
    neighbor-of-neighbor refinement rounds with round-shifted
    exploration successors (derandomized ρ-sampling); the oracle
    replays init + both rounds bit-for-bit."""
    from unarxive_spark.operators.similarity import nn_descent

    emb = _t(spark, sf_dir, "embeddings")
    out = nn_descent(
        emb,
        k=NNDESC_K,
        rounds=NNDESC_ROUNDS,
        init_k=NNDESC_K,
        n_shards=NNDESC_SHARDS,
        n_planes=NNDESC_PLANES,
        dim=64,
        seed=NNDESC_SEED,
    )
    return out.select(
        "src_id", "dst_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def _sql_nn_descent() -> str:
    from unarxive_spark.functions.hashing import h64_sql

    k, shards = NNDESC_K, NNDESC_SHARDS
    planes, seed, dim = NNDESC_PLANES, NNDESC_SEED, 64
    h = h64_sql("CAST(id AS VARCHAR)")

    def dot(a, b):
        return (
            f"list_sum(list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        )

    rounds_sql = ""
    for r in range(1, NNDESC_ROUNDS + 1):
        p = r - 1
        rounds_sql += f""",
u{r} AS MATERIALIZED (
  SELECT src, dst FROM g{p}
  UNION
  SELECT dst, src FROM g{p}
),
fresh{r} AS (
  SELECT src, dst FROM (
    SELECT a.src AS src, b.dst AS dst
    FROM u{r} a JOIN u{r} b ON a.dst = b.src
    WHERE a.src != b.dst
    UNION
    SELECT a.id AS src, b.id AS dst
    FROM hrank a
    CROSS JOIN nt
    CROSS JOIN range({r * k + 1}, {(r + 1) * k + 1}) j
    JOIN hrank b ON b.grank = (a.grank - 1 + j.range) % nt.n + 1
    WHERE a.id != b.id
  )
  EXCEPT
  SELECT src, dst FROM g{p}
),
sf{r} AS (
  SELECT f.src, f.dst,
         {dot('vs.vec', 'vd.vec')} / (vs.norm * vd.norm) AS cosine
  FROM fresh{r} f
  JOIN v vs ON vs.id = f.src
  JOIN v vd ON vd.id = f.dst
),
g{r} AS MATERIALIZED (
  SELECT src, dst, cosine FROM (
    SELECT src, dst, cosine,
           row_number() OVER (PARTITION BY src
                              ORDER BY cosine DESC, dst ASC) AS rk
    FROM (SELECT * FROM g{p} UNION ALL SELECT * FROM sf{r})
  ) WHERE rk <= {k}
)"""

    # ±1 hyperplane pattern identical to
    # operators.similarity.hyperplane_sketch (and the q53 oracle)
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id AS id, embedding AS vec,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
  FROM embeddings
  WHERE sqrt(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
),
planes AS (
  SELECT p.range AS p, j.range AS j,
         CASE WHEN CAST(('0x' || substr(
                md5('{seed}|' || p.range || '|' || j.range), 1, 8))
              AS BIGINT) % 2 = 0
              THEN 1e0 ELSE -1e0 END AS s
  FROM range({planes}) p, range({dim}) j
),
pvec AS (SELECT p, list(s ORDER BY j) AS svec FROM planes GROUP BY p),
vproj AS (
  SELECT v.id, sv.p,
         list_sum(list_transform(range(1, len(v.vec) + 1),
            i -> CAST(v.vec[i] AS DOUBLE) * sv.svec[i])) AS pr
  FROM v CROSS JOIN pvec sv
),
vbkt AS (
  SELECT id, CAST(SUM(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << p
                           ELSE 0 END) AS BIGINT) AS bucket
  FROM vproj GROUP BY id
),
brank AS MATERIALIZED (
  SELECT id, row_number() OVER (ORDER BY bucket, h, id) AS grank
  FROM (SELECT id, bucket, {h} AS h FROM vbkt)
),
hrank AS MATERIALIZED (
  SELECT id, row_number() OVER (ORDER BY h % {shards}, h, id) AS grank
  FROM (SELECT id, {h} AS h FROM v)
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM hrank),
p0 AS (
  SELECT DISTINCT a.id AS src, b.id AS dst
  FROM brank a
  CROSS JOIN nt
  CROSS JOIN range(1, {k + 1}) j
  JOIN brank b ON b.grank = (a.grank - 1 + j.range) % nt.n + 1
  WHERE a.id != b.id
),
s0 AS (
  SELECT p.src, p.dst,
         {dot('vs.vec', 'vd.vec')} / (vs.norm * vd.norm) AS cosine
  FROM p0 p
  JOIN v vs ON vs.id = p.src
  JOIN v vd ON vd.id = p.dst
),
g0 AS MATERIALIZED (
  SELECT src, dst, cosine FROM (
    SELECT src, dst, cosine,
           row_number() OVER (PARTITION BY src
                              ORDER BY cosine DESC, dst ASC) AS rk
    FROM s0
  ) WHERE rk <= {k}
){rounds_sql}
SELECT src AS src_id, dst AS dst_id, round(cosine, 6) AS cosine,
       CAST(row_number() OVER (PARTITION BY src
                               ORDER BY cosine DESC, dst ASC) AS INT)
         AS rank
FROM g{NNDESC_ROUNDS}"""


SQL_NN_DESCENT = _sql_nn_descent()


BPE_MERGES = 6


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE merge learning (operators/corpus.py): 6 greedy
    merge rounds over the documents corpus — the tokenizer-training
    pass of an LLM data pipeline. Per round: corpus-wide adjacent-pair
    count (map-side-combinable groupBy), deterministic argmax
    (count desc, a asc, b asc), one literal-replace merge applied
    row-locally. The oracle unrolls the six rounds as MATERIALIZED
    CTEs and replays the same left-to-right non-overlapping replace —
    both engines' ``replace`` scans left-to-right, which IS the greedy
    BPE apply order. Exhaustion raises in the engine and empties a
    round in the oracle (row-count mismatch), so truncation can never
    silently diverge."""
    from unarxive_spark.operators.corpus import bpe_merges

    d = _t(spark, sf_dir, "documents")
    return bpe_merges(d, n_merges=BPE_MERGES)


def _sql_bpe_merges() -> str:
    sep = "chr(1)"
    sep2 = "(chr(1) || chr(1))"
    tok = (
        "list_filter(string_split_regex(trim(lower("
        "replace(text, chr(1), ''))), '\\s+'), t -> t != '')"
    )
    parts = [
        f"""
WITH s0 AS MATERIALIZED (
  SELECT {sep} || array_to_string(toks, {sep2}) || {sep} AS s
  FROM (SELECT {tok} AS toks FROM documents)
  WHERE len(toks) > 0
)"""
    ]
    for k in range(1, BPE_MERGES + 1):
        prev = f"s{k - 1}"
        parts.append(
            f""",
p{k} AS MATERIALIZED (
  SELECT toks[i] AS a, toks[i + 1] AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM (SELECT string_split(substr(s, 2, length(s) - 2), {sep2})
          AS toks
        FROM {prev}),
       unnest(range(1, len(toks))) AS u(i)
  GROUP BY 1, 2
),
t{k} AS MATERIALIZED (
  SELECT {k} AS merge_rank, a AS token_a, b AS token_b,
         c AS pair_count
  FROM p{k} ORDER BY c DESC, a ASC, b ASC LIMIT 1
),
s{k} AS MATERIALIZED (
  SELECT replace(s,
                 {sep} || token_a || {sep} || {sep} || token_b || {sep},
                 {sep} || token_a || token_b || {sep}) AS s
  FROM {prev}, t{k}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM t{k}" for k in range(1, BPE_MERGES + 1)
    )
    return "".join(parts) + "\n" + union


SQL_BPE_MERGES = _sql_bpe_merges()


def q_unigram_lm(spark, sf_dir):
    """Corpus-trained Laplace unigram LM scoring (operators/corpus.py)
    — the perplexity quality filter of an LLM data pipeline. Every
    ``ln`` input is an exact integer (c+1 and N+V), so both engines
    evaluate identical expressions; only the two per-doc sums float
    (rounded to 6)."""
    from unarxive_spark.operators.corpus import unigram_lm_scores

    d = _t(spark, sf_dir, "documents")
    return unigram_lm_scores(d)


def _sql_unigram_lm() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    ce = (
        "(sum(tf) * ln(n_total + vocab) - sum(tf * ln(c + 1)))"
        " / sum(tf)"
    )
    return f"""
WITH tf AS (
  SELECT id, t, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id AS id, unnest({tok}) AS t FROM documents
  ) GROUP BY 1, 2
),
cnt AS (SELECT t, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
sc AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
              CAST(count(*) AS BIGINT) AS vocab FROM cnt)
SELECT id AS doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       round({ce}, 6) AS cross_entropy,
       round(exp({ce}), 6) AS perplexity
FROM tf JOIN cnt USING (t), sc
GROUP BY id, n_total, vocab"""


SQL_UNIGRAM_LM = _sql_unigram_lm()


# integer per-mille mixture weights: downsample / upsample+frac /
# multi-epoch / drop; unlisted domains default to 1000 (one copy)
MIXTURE_WEIGHTS = {"src0": 250, "src1": 1500, "src2": 3400, "src3": 0}


def q_mixture_sample(spark, sf_dir):
    """Domain-mixture sampling (operators/mltasks.py): exact integer
    per-mille reweighting of the documents corpus by source domain —
    ⌊w⌋ copies plus one extra for exactly ⌈frac·N_dom⌉ docs picked in
    the canonical de-skewed (shard, h64, id) order. All thresholds are
    integer arithmetic, so the oracle reproduces copies row-for-row."""
    from unarxive_spark.operators.mltasks import mixture_sample

    d = _t(spark, sf_dir, "documents")
    return mixture_sample(d, MIXTURE_WEIGHTS, n_shards=32)


def _sql_mixture_sample() -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)")
    vals = ", ".join(
        f"('{s}', {pm})" for s, pm in sorted(MIXTURE_WEIGHTS.items())
    )
    return f"""
WITH base AS (
  SELECT doc_id, source, {h} AS hh FROM documents
),
ranked AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY hh % 32, hh, doc_id
         ) AS BIGINT) AS rk
  FROM base
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM base GROUP BY 1),
wts(source, pm) AS (VALUES {vals})
SELECT doc_id, r.source,
       CAST(coalesce(pm, 1000) // 1000 + CASE
         WHEN rk <= ((coalesce(pm, 1000) % 1000) * n + 999) // 1000
         THEN 1 ELSE 0 END AS BIGINT) AS n_copies
FROM ranked r
JOIN sizes s ON s.source = r.source
LEFT JOIN wts w ON w.source = r.source"""


SQL_MIXTURE_SAMPLE = _sql_mixture_sample()


def q_snapshot_diff(spark, sf_dir):
    """Snapshot CDC (operators/diffs.py): two deterministic versions of
    the orders table (old = orderdate < 1998; new = [1996, 2000) with
    o_totalprice bumped for orderkey % 7 == 0) diffed into
    insert/delete/update rows — one co-partitioned full outer join,
    null-safe column compare, no window."""
    from unarxive_spark.operators.diffs import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    new = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    ).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


SQL_SNAPSHOT_DIFF = """
WITH o AS (
  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
),
n AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
              ELSE o_totalprice END AS pr
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '2000-01-01'
)
SELECT o_orderkey, change_type FROM (
  SELECT COALESCE(o.k, n.k) AS o_orderkey,
         CASE WHEN o.k IS NULL THEN 'insert'
              WHEN n.k IS NULL THEN 'delete'
              WHEN (o.st IS DISTINCT FROM n.st)
                OR (o.pr IS DISTINCT FROM n.pr) THEN 'update'
         END AS change_type
  FROM o FULL JOIN n ON o.k = n.k
) WHERE change_type IS NOT NULL"""


def q_match_cascade(spark, sf_dir):
    """J4 flagship-join analog: fuzzy mention → document resolution via
    the 3-level key cascade + containment filter + argmax(n_chars).
    Mentions are derived deterministically from documents (doc_id % 3
    selects full / prepended / appended variants, exercising all three
    cascade levels; the tiny shared vocabulary forces multi-candidate
    keys, exercising the argmax disambiguation)."""
    from unarxive_spark.operators.resolve import match_cascade

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), r"\s+")
    base = d.select(
        "doc_id", toks.alias("t"), "n_chars"
    ).filter(F.size("t") >= 4)
    key4 = F.concat_ws(" ", F.slice("t", 1, 4))
    dim = base.select(
        "doc_id",
        key4.alias("dim_key"),
        F.col("n_chars").alias("rank_metric"),
        F.element_at("t", 1).alias("first_token"),
    )
    mention = (
        F.when(F.col("doc_id") % 3 == 0, key4)
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("zqz "), key4))
        .otherwise(F.concat(key4, F.lit(" zqz")))
    )
    mentions = base.select(
        F.col("doc_id").alias("mention_id"), mention.alias("mention")
    )
    return match_cascade(mentions, dim)


SQL_MATCH_CASCADE = """
WITH toks AS (
  SELECT doc_id, n_chars,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t != '') AS t
  FROM documents
),
base AS (SELECT * FROM toks WHERE len(t) >= 4),
dim AS (
  SELECT doc_id, array_to_string(t[1:4], ' ') AS dk,
         n_chars AS metric, t[1] AS ft
  FROM base
),
mentions AS (
  SELECT doc_id AS mention_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN array_to_string(t[1:4], ' ')
           WHEN 1 THEN 'zqz ' || array_to_string(t[1:4], ' ')
           ELSE array_to_string(t[1:4], ' ') || ' zqz' END AS mention
  FROM base
),
keyed AS (
  SELECT mention_id, mention,
         mention AS k1,
         array_to_string(string_split(mention, ' ')[2:], ' ') AS k2,
         array_to_string(
           string_split(mention, ' ')[1:len(string_split(mention, ' ')) - 1],
           ' ') AS k3,
         string_split(mention, ' ') AS mtoks
  FROM mentions
),
cands AS (
  SELECT mention_id, d.doc_id, d.metric, d.ft, k.mtoks, 1 AS match_rank
  FROM keyed k JOIN dim d ON k.k1 = d.dk
  UNION ALL
  SELECT mention_id, d.doc_id, d.metric, d.ft, k.mtoks, 2
  FROM keyed k JOIN dim d ON k.k2 = d.dk
  UNION ALL
  SELECT mention_id, d.doc_id, d.metric, d.ft, k.mtoks, 3
  FROM keyed k JOIN dim d ON k.k3 = d.dk
)
SELECT mention_id, doc_id, CAST(match_rank AS INT) AS match_rank
FROM (
  SELECT mention_id, doc_id, match_rank,
         row_number() OVER (PARTITION BY mention_id
                            ORDER BY match_rank ASC, metric DESC,
                                     doc_id ASC) AS rn
  FROM cands
  WHERE list_contains(mtoks, ft)
) WHERE rn = 1"""


def q_license_histogram(spark, sf_dir):
    """License classifier histogram (P19/P20, calc_stats.py:56-87 +
    count_licenses.py): derive the license URL deterministically per
    document, classify coarse + fine via the URL-parsing when-chain,
    count + permissive share per bucket."""
    from unarxive_spark.functions.license import (
        derive_license_url,
        is_permissive,
        license_coarse,
        license_fine,
    )

    d = _t(spark, sf_dir, "documents")
    url = derive_license_url("doc_id")
    classified = d.select(
        license_coarse(url).alias("license_coarse"),
        license_fine(url).alias("license_fine"),
        F.when(is_permissive(url), 1).otherwise(0).alias("_perm"),
    )
    return classified.groupBy("license_coarse", "license_fine").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_perm").alias("n_permissive"),
    )


def _sql_license_histogram() -> str:
    from unarxive_spark.functions.license import (
        derive_license_url_sql,
        is_permissive_sql,
        license_coarse_sql,
        license_fine_sql,
    )

    url = derive_license_url_sql("doc_id")
    return f"""
WITH lic AS (
  SELECT {license_coarse_sql(url)} AS license_coarse,
         {license_fine_sql(url)} AS license_fine,
         CASE WHEN {is_permissive_sql(url)} THEN 1 ELSE 0 END AS perm
  FROM documents
)
SELECT license_coarse, license_fine,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(perm) AS BIGINT) AS n_permissive
FROM lic GROUP BY 1, 2"""


SQL_LICENSE_HISTOGRAM = _sql_license_histogram()


def q_doi_resolution(spark, sf_dir):
    """P14 DOI extraction + P15 implicit-DOI fallback: a third of the
    docs get a deterministic explicit DOI mention spliced into their
    text (with trailing punctuation, exercising the trim); extraction
    runs the Crossref regex, misses fall back to the derived
    journal-based DOI, and the result rolls up by registrant prefix."""
    from unarxive_spark.functions.refs import extract_dois, implicit_doi

    d = _t(spark, sf_dir, "documents")
    doi_lit = F.concat(
        F.lit(" see doi:10."),
        (4000 + F.col("doc_id") % 100).cast("string"),
        F.lit("/j."),
        F.col("source"),
        F.lit("."),
        F.col("doc_id").cast("string"),
        F.lit("."),  # trailing sentence punctuation — must be stripped
    )
    text2 = F.when(
        F.col("doc_id") % 3 == 0, F.concat(F.col("text"), doi_lit)
    ).otherwise(F.col("text"))
    explicit = F.try_element_at(extract_dois(text2), F.lit(1))
    final = F.coalesce(explicit, implicit_doi("source", "doc_id"))
    rows = d.select(
        F.element_at(F.split(final, "/"), 1).alias("registrant"),
        F.when(explicit.isNotNull(), 1).otherwise(0).alias("_exp"),
    )
    return rows.groupBy("registrant").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_exp").alias("n_explicit"),
        F.sum(1 - F.col("_exp")).alias("n_derived"),
    )


def _sql_doi_resolution() -> str:
    from unarxive_spark.functions.refs import (
        extract_dois_sql,
        implicit_doi_sql,
    )

    text2 = (
        "CASE WHEN doc_id % 3 = 0 THEN text || ' see doi:10.' || "
        "CAST(4000 + doc_id % 100 AS VARCHAR) || '/j.' || source || '.' "
        "|| CAST(doc_id AS VARCHAR) || '.' ELSE text END"
    )
    explicit = f"list_extract({extract_dois_sql(text2)}, 1)"
    final = f"COALESCE({explicit}, {implicit_doi_sql('source', 'doc_id')})"
    return f"""
WITH rows_ AS (
  SELECT string_split({final}, '/')[1] AS registrant,
         CASE WHEN {explicit} IS NOT NULL THEN 1 ELSE 0 END AS exp
  FROM documents
)
SELECT registrant, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(exp) AS BIGINT) AS n_explicit,
       CAST(sum(1 - exp) AS BIGINT) AS n_derived
FROM rows_ GROUP BY 1"""


SQL_DOI_RESOLUTION = _sql_doi_resolution()


def q_order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-style left-semi join + grouped count —
    orders in a date window having at least one discounted lineitem,
    counted per priority (pushdown-able filters on both sides)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_ORDER_PRIORITY_CHECK = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY 1"""


def q_moving_avg_value(spark, sf_dir):
    """Bounded window frame (§2.5): per-user moving average of event
    value over the current + 3 preceding events, time-ordered."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("avg_value_4"),
    )


SQL_MOVING_AVG_VALUE = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
         AS avg_value_4
FROM events"""


def q_repeat_buyers(spark, sf_dir):
    """Set operation (§2.7 INTERSECT): customers that have BOTH an open
    and a finished order — distinct-set semantics on both engines."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.filter("o_orderstatus = 'O'").select("o_custkey")
    done_c = o.filter("o_orderstatus = 'F'").select("o_custkey")
    return open_c.intersect(done_c).withColumnRenamed(
        "o_custkey", "custkey"
    )


SQL_REPEAT_BUYERS = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"""


def q_asof_join(spark, sf_dir):
    """As-of join (nearest-earlier match; task-brief custom operator):
    each purchase gets the user's most recent prior 'view' event.  Engine: one-shuffle union + running-last window
    (operators/asof.py); oracle: DuckDB's native ASOF LEFT JOIN.  The
    right side is deduped to one row per (user, ts) in BOTH engines so
    the match is tie-free."""
    from unarxive_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    views = (
        ev.filter("event_type = 'view'")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "ts", "value")
    )
    res = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_cols=["value"]
    )
    return res.select(
        "event_id",
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        )
        .cast("long")
        .alias("wait_us"),
        F.round("asof_value", 6).alias("view_value"),
    )


def q_asof_join_chunked(spark, sf_dir):
    """The de-skewed two-stage as-of path (chunk_s): identical
    semantics to q55 — same DuckDB oracle — but a mega-user's history
    sorts across independent (user, time-chunk) tasks. A green row here
    driver-checks the skew escape hatch end-to-end."""
    from unarxive_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    views = (
        ev.filter("event_type = 'view'")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "ts", "value")
    )
    res = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_cols=["value"],
        chunk_s=6 * 3600,
    )
    return res.select(
        "event_id",
        "user_id",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp"))
        )
        .cast("long")
        .alias("wait_us"),
        F.round("asof_value", 6).alias("view_value"),
    )


SQL_ASOF_JOIN = """
WITH v AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id) AS rn
    FROM events WHERE event_type = 'view'
  ) WHERE rn = 1
)
SELECT p.event_id, p.user_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS wait_us,
       round(v.value, 6) AS view_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"""


def q_range_join(spark, sf_dir):
    """Point-in-interval range join: purchases falling inside each
    error's 1-hour incident window, per user.  Engine: bucketized
    equi-join candidates + exact filter (operators/rangejoin.py) — no
    nested-loop join; oracle: DuckDB's native inequality (IE) join."""
    from unarxive_spark.operators.rangejoin import point_in_interval_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter("event_type = 'error'").select(
        F.col("event_id").alias("iid"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("pid"), "user_id", "ts", "value"
    )
    hits = point_in_interval_join(
        purchases, errors, on=["user_id"], bucket_s=1800
    )
    agg = hits.groupBy("iid").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("value").alias("pv"),
    )
    return errors.join(agg, "iid", "left").select(
        F.col("iid").alias("event_id"),
        "user_id",
        F.coalesce("n_purchases", F.lit(0)).cast("long").alias("n_purchases"),
        F.round(F.coalesce("pv", F.lit(0.0)), 6).alias("purchase_value"),
    )


def q_repetition(spark, sf_dir):
    """Gopher-style repetition screen over documents: type-token ratio
    + most-frequent-bigram dominance (operators/quality.py — explode →
    partial-agg groupBy, linear and distributed)."""
    from unarxive_spark.operators.quality import repetition_metrics

    d = _t(spark, sf_dir, "documents")
    m = repetition_metrics(d)
    return m.select(
        "doc_id",
        "n_tokens",
        F.round("ttr", 6).alias("ttr"),
        "top_bigram_count",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


def _sql_repetition() -> str:
    from unarxive_spark.operators.quality import repetition_metrics_sql

    return f"""
SELECT doc_id, n_tokens, round(ttr, 6) AS ttr, top_bigram_count,
       round(top_bigram_frac, 6) AS top_bigram_frac
FROM ({repetition_metrics_sql()})"""


SQL_REPETITION = _sql_repetition()


def q_pii_scrub(spark, sf_dir):
    """PII redaction stage: the synthetic corpus carries no PII, so the
    query plants deterministic emails/phones derived from doc_id
    (identically in both engines) and value-checks counts + the h64 of
    the redacted text — the scrub itself is what's being oracle-checked.
    """
    from unarxive_spark.functions.texttools import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("ptext"),
    )
    n_mail, n_phone = pii_counts("ptext")
    return planted.select(
        "doc_id",
        n_mail.cast("long").alias("n_emails"),
        n_phone.cast("long").alias("n_phones"),
        h64(redact_pii("ptext")).alias("scrubbed_h64"),
    )


def _sql_pii_scrub() -> str:
    from unarxive_spark.functions.texttools import (
        pii_counts_sql,
        redact_pii_sql,
    )

    planted = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com or call +1-555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'"
    )
    mail, phone = pii_counts_sql("ptext")
    return f"""
SELECT doc_id,
       CAST({mail} AS BIGINT) AS n_emails,
       CAST({phone} AS BIGINT) AS n_phones,
       {h64_sql(redact_pii_sql('ptext'))} AS scrubbed_h64
FROM (SELECT doc_id, {planted} AS ptext FROM documents)"""


SQL_PII_SCRUB = _sql_pii_scrub()


def q_distinct_sketch(spark, sf_dir):
    """Portable Flajolet-Martin distinct sketch per event_type next to
    the exact count (operators/sketch.py) — the estimate itself is
    value-checked against DuckDB running the same register math."""
    from unarxive_spark.operators.sketch import distinct_sketch

    ev = _t(spark, sf_dir, "events")
    sk = distinct_sketch(ev, "user_id", ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return exact.join(sk, "event_type").select(
        "event_type",
        "n_exact",
        F.round("est_distinct", 4).alias("est_distinct"),
    )


def _sql_distinct_sketch() -> str:
    from unarxive_spark.operators.sketch import distinct_sketch_sql

    return f"""
WITH sk AS ({distinct_sketch_sql("events", "user_id", ["event_type"])}),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT ex.event_type, ex.n_exact, round(sk.est_distinct, 4) AS est_distinct
FROM ex JOIN sk USING (event_type)"""


SQL_DISTINCT_SKETCH = _sql_distinct_sketch()


def q_stratified_split(spark, sf_dir):
    """Proportional-minima stratified split (A9,
    ml_tasks_split_data.py:155-171 semantics) driven over documents:
    every lang stratum contributes exactly ceil(N·share) rows to each
    held-out split; per-(lang, split) counts are the checked surface."""
    from unarxive_spark.operators.mltasks import stratified_split_minima

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    split = stratified_split_minima(
        d, strata_cols=("lang",), id_col="doc_id"
    )
    return split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n")
    )


def _sql_stratified_split(train=0.8, dev=0.1, seed=42) -> str:
    test = 1.0 - train - dev
    key = h64_sql("concat_ws('|', '42', CAST(doc_id AS VARCHAR))")
    return f"""
WITH ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {key}, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       CASE WHEN rk <= CAST(ceil(n * {dev!r}e0) AS BIGINT) THEN 'dev'
            WHEN rk <= CAST(ceil(n * {dev!r}e0) AS BIGINT)
                       + CAST(ceil(n * {test!r}e0) AS BIGINT) THEN 'test'
            ELSE 'train' END AS split,
       CAST(count(*) AS BIGINT) AS n
FROM ranked GROUP BY 1, 2"""


SQL_STRATIFIED_SPLIT = _sql_stratified_split()


def q_value_quantiles(spark, sf_dir):
    """Exact interpolated quantiles per group (the agg-surface item the
    A1-A10 inventory lacks; both engines use linear interpolation, so
    the values match to rounding)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("round(percentile(value, 0.5), 6)").alias("p50"),
        F.expr("round(percentile(value, 0.9), 6)").alias("p90"),
        F.expr("round(percentile(value, 0.99), 6)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1"""


def q_cm_sketch(spark, sf_dir):
    """Count-Min frequency sketch (operators/sketch.py): per-user event
    counts estimated from the d x w counter table next to the exact
    counts — all integer arithmetic, so the oracle matches exactly."""
    from unarxive_spark.operators.sketch import cm_estimate, cm_sketch

    ev = _t(spark, sf_dir, "events")
    sk = cm_sketch(ev, "user_id")
    keys = ev.select("user_id").distinct()
    est = cm_estimate(sk, keys, "user_id")
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return exact.join(est, "user_id").select(
        "user_id", "n_exact", "est_count"
    )


def _sql_cm_sketch() -> str:
    from unarxive_spark.operators.sketch import cm_sketch_sql

    return f"""
WITH est AS ({cm_sketch_sql("events", "user_id")}),
ex AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT ex.user_id, ex.n_exact, est.est_count
FROM ex JOIN est ON est.k = ex.user_id"""


SQL_CM_SKETCH = _sql_cm_sketch()


def q_bloom_semijoin(spark, sf_dir):
    """Bloom-filter semi-join pruning: membership of every user against
    the purchase-users bloom, next to the exact semi-join flag. False
    positives are a deterministic function of the md5 bit math, so the
    oracle matches them exactly too."""
    from unarxive_spark.operators.sketch import bloom_build, bloom_contains

    ev = _t(spark, sf_dir, "events")
    buyers = ev.filter("event_type = 'purchase'").select("user_id")
    bl = bloom_build(buyers, "user_id")
    probes = ev.select("user_id").distinct()
    flags = bloom_contains(bl, probes, "user_id")
    exact = (
        probes.join(buyers.distinct(), "user_id", "left_semi")
        .withColumn("in_exact", F.lit(1))
    )
    return (
        flags.join(exact, "user_id", "left")
        .select(
            "user_id",
            "in_bloom",
            F.coalesce("in_exact", F.lit(0)).cast("int").alias("in_exact"),
        )
    )


def _sql_bloom_semijoin() -> str:
    from unarxive_spark.operators.sketch import bloom_sql

    inner = bloom_sql(
        "(SELECT user_id FROM events WHERE event_type = 'purchase')",
        "user_id",
        "events",
        "user_id",
    )
    return f"""
WITH fl AS ({inner}),
ex AS (SELECT DISTINCT user_id FROM events
       WHERE event_type = 'purchase')
SELECT fl.k AS user_id, fl.in_bloom,
       CAST(CASE WHEN ex.user_id IS NULL THEN 0 ELSE 1 END AS INT)
         AS in_exact
FROM fl LEFT JOIN ex ON ex.user_id = fl.k"""


SQL_BLOOM_SEMIJOIN = _sql_bloom_semijoin()


# q-digest sketch parameters shared by the state and quantile rows:
# k=64 forces real merging at sf0.01 (~2k rows/group → threshold 31);
# bits=12 → 4096-leaf universe over value ∈ [0, 1024)
QD_K, QD_BITS, QD_LO, QD_HI = 64, 12, 0.0, 1024.0
QD_PROBS = (0.1, 0.5, 0.9, 0.99)


def q_qdigest_state(spark, sf_dir):
    """Mergeable quantile sketch (operators/qdigest.py, q-digest —
    Shrivastava et al. SenSys 2004): the full per-group node table,
    value-checked BIT-FOR-BIT against the DuckDB unrolled bottom-up
    sweep.  The exact-quantile row (q64) forces a per-group sort at
    scale; this digest is the mergeable O(k·bits)-state replacement."""
    from unarxive_spark.operators.qdigest import qdigest

    ev = _t(spark, sf_dir, "events")
    return qdigest(
        ev, "value", ["event_type"], k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI
    )


def _sql_qdigest_state() -> str:
    from unarxive_spark.operators.qdigest import qdigest_sql

    return qdigest_sql(
        "events", "value", ["event_type"], k=QD_K, bits=QD_BITS,
        lo=QD_LO, hi=QD_HI,
    )


SQL_QDIGEST_STATE = _sql_qdigest_state()


def q_qdigest_quantiles(spark, sf_dir):
    """Quantile answers read off the q-digest via the canonical sorted
    traversal (upper bound asc, narrower node first, running count) —
    integer leaf index exact, dequantized value to rounding."""
    from unarxive_spark.operators.qdigest import (
        qdigest,
        qdigest_quantiles,
    )

    ev = _t(spark, sf_dir, "events")
    d = qdigest(
        ev, "value", ["event_type"], k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI
    )
    return qdigest_quantiles(
        d, ["event_type"], QD_PROBS, bits=QD_BITS, lo=QD_LO, hi=QD_HI
    ).withColumn("q_value", F.round("q_value", 6))


def _sql_qdigest_quantiles() -> str:
    from unarxive_spark.operators.qdigest import qdigest_quantiles_sql

    inner = qdigest_quantiles_sql(
        "events", "value", ["event_type"], QD_PROBS,
        k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI,
    )
    return (
        f"SELECT event_type, prob, q_leaf, round(q_value, 6) AS q_value"
        f" FROM ({inner})"
    )


SQL_QDIGEST_QUANTILES = _sql_qdigest_quantiles()


# strong near-dups only: cluster edges are pairs with J >= 0.5
DEDUP_CLUSTER_T = 0.5
DEDUP_WCC_ROUNDS = 6


def q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs → connected clusters → one kept survivor per
    cluster (min doc id): the collapse step after candidate
    verification — A~B and B~C must keep exactly one of {A,B,C} even
    though A~C was never generated. Oracle: the same Jaccard pair SQL +
    hash-min WCC rounds UNROLLED (with a fixpoint sentinel) + the same
    min-id survivor rule."""
    from unarxive_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, threshold=DEDUP_CLUSTER_T, length_filter=True
    )
    return dedup_clusters(d, pairs)


def _sql_dedup_clusters(rounds: int) -> str:
    parts = [
        f"""sh AS (
  SELECT DISTINCT doc_id AS id, unnest({_shingles_sql("text")}) AS shingle
  FROM documents
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
jp AS MATERIALIZED (
  SELECT id_a, id_b FROM (
    SELECT l.id AS id_a, r.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.id < r.id
    GROUP BY 1, 2
  ) s
  JOIN sizes sa ON sa.id = s.id_a
  JOIN sizes sb ON sb.id = s.id_b
  WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared)
        >= {DEDUP_CLUSTER_T!r}e0
),
dde AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM jp
  UNION
  SELECT id_b, id_a FROM jp
),
dl0 AS MATERIALIZED (
  SELECT u AS id, u AS lbl FROM (SELECT DISTINCT u FROM dde)
)"""
    ]
    for r in range(rounds):
        parts.append(f"""dl{r + 1} AS MATERIALIZED (
  SELECT l.id, LEAST(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
  FROM dl{r} l
  LEFT JOIN dde e ON e.u = l.id
  LEFT JOIN dl{r} nl ON nl.id = e.v
  GROUP BY l.id, l.lbl
)""")
    ctes = ",\n".join(parts)
    return f"""WITH {ctes}
SELECT d.doc_id,
       coalesce(l.lbl, d.doc_id) AS cluster_rep,
       CAST(CASE WHEN coalesce(l.lbl, d.doc_id) = d.doc_id
                 THEN 1 ELSE 0 END AS INT) AS is_kept
FROM documents d
LEFT JOIN dl{rounds} l ON l.id = d.doc_id
UNION ALL
-- fixpoint sentinel (doc ids are BIGINT, so the poison row is numeric)
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS INT)
WHERE EXISTS (SELECT 1 FROM dl{rounds} a
              JOIN dl{rounds - 1} b ON b.id = a.id
              WHERE a.lbl != b.lbl)"""


SQL_DEDUP_CLUSTERS = _sql_dedup_clusters(DEDUP_WCC_ROUNDS)


def q_qdigest_merge(spark, sf_dir):
    """The sketch's headline property in the driver gate: two digests
    built over disjoint halves of events (even/odd event_id) merged by
    union + sum + re-compress — the merged node table value-checked
    BIT-FOR-BIT against the DuckDB replay of the same merge. This is
    the cross-partition / cross-snapshot combine a 100-TB rollup relies
    on."""
    from unarxive_spark.operators.qdigest import qdigest, qdigest_merge

    ev = _t(spark, sf_dir, "events")
    d1 = qdigest(
        ev.filter(F.col("event_id") % 2 == 0), "value", ["event_type"],
        k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI,
    )
    d2 = qdigest(
        ev.filter(F.col("event_id") % 2 == 1), "value", ["event_type"],
        k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI,
    )
    return qdigest_merge(d1, d2, ["event_type"], k=QD_K, bits=QD_BITS)


def _sql_qdigest_merge() -> str:
    from unarxive_spark.operators.qdigest import qdigest_merge_sql

    return qdigest_merge_sql(
        "(SELECT * FROM events WHERE event_id % 2 = 0)",
        "(SELECT * FROM events WHERE event_id % 2 = 1)",
        "value",
        ["event_type"],
        k=QD_K,
        bits=QD_BITS,
        lo=QD_LO,
        hi=QD_HI,
    )


SQL_QDIGEST_MERGE = _sql_qdigest_merge()


QT_LO_P, QT_HI_P = 0.05, 0.95


def q_outlier_trim(spark, sf_dir):
    """Digest-driven percentile trim: per-group [p05, p95] leaf bounds
    from the q-digest applied as a broadcast filter — approximate-
    percentile data cleaning without a per-group sort. Kept/dropped
    decisions are integer-leaf comparisons, so the counts are exact
    cross-engine."""
    from unarxive_spark.operators.qdigest import qdigest_trim

    ev = _t(spark, sf_dir, "events")
    flagged = qdigest_trim(
        ev, "value", ["event_type"],
        lo_p=QT_LO_P, hi_p=QT_HI_P,
        k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI,
    )
    return flagged.groupBy("event_type").agg(
        F.sum("__keep").alias("n_kept"),
        F.sum(F.lit(1) - F.col("__keep")).alias("n_dropped"),
    )


def _sql_outlier_trim() -> str:
    from unarxive_spark.operators.qdigest import (
        qdigest_quantiles_sql,
        quantize_sql,
    )

    inner = qdigest_quantiles_sql(
        "events", "value", ["event_type"], [QT_LO_P, QT_HI_P],
        k=QD_K, bits=QD_BITS, lo=QD_LO, hi=QD_HI,
    )
    leaf = quantize_sql("e.value", QD_LO, QD_HI, QD_BITS)
    return f"""
WITH qb AS ({inner}),
tb AS (
  SELECT event_type,
         min(CASE WHEN prob = {QT_LO_P!r}e0 THEN q_leaf END) AS lo_leaf,
         min(CASE WHEN prob = {QT_HI_P!r}e0 THEN q_leaf END) AS hi_leaf
  FROM qb GROUP BY 1
)
SELECT e.event_type,
       CAST(sum(CASE WHEN {leaf} BETWEEN tb.lo_leaf AND tb.hi_leaf
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN {leaf} BETWEEN tb.lo_leaf AND tb.hi_leaf
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM events e JOIN tb USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY 1"""


SQL_OUTLIER_TRIM = _sql_outlier_trim()


def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition model over per-user event
    sequences (the user-journey analog of the funnel): consecutive
    event pairs via one lead() window in each user's (ts, event_id)
    order, then a tiny |states|²-row count + row-conditional
    probability. At scale the window partitions on the high-cardinality
    user key (no skew) and the aggregate is map-side combinable."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            F.col("event_type").alias("from_state"),
            F.lead("event_type").over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_state")
    return t.select(
        "from_state",
        "to_state",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(w_from),
            6,
        ).alias("prob"),
    )


SQL_MARKOV_TRANSITIONS = """
WITH t AS (
  SELECT event_type AS from_state,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_state
  FROM events
),
c AS (
  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_transitions
  FROM t WHERE to_state IS NOT NULL GROUP BY 1, 2
)
SELECT from_state, to_state, n_transitions,
       round(CAST(n_transitions AS DOUBLE) /
             CAST(sum(n_transitions) OVER (PARTITION BY from_state)
                  AS BIGINT), 6) AS prob
FROM c"""


def q_repeated_spans(spark, sf_dir):
    """Suffix-array repeated-span spectrum over the documents corpus
    (the ExactSubstr-dedup signal of Lee et al. 2021): distributed
    prefix-doubling suffix ranks, adjacent-suffix LCPs by binary
    lifting, histogram by span length. Reference analog: the fixed
    128-char fingerprint screen (q29) can only sample one window size;
    this measures EVERY repeated token span exactly."""
    from unarxive_spark.operators.suffixarray import repeated_span_histogram

    return repeated_span_histogram(_t(spark, sf_dir, "documents"))


# LCP of adjacent suffixes in generalized-suffix-array order, replayed
# exactly: suffixes as token sublists, sorted (DuckDB list ordering is
# lexicographic with prefix-shorter-first — identical to prefix-doubling
# ranks padded with -1 past doc end), LCP via first-mismatch position.
# nullif(...): this DuckDB's list_position returns 0 (not NULL) when no
# mismatch exists, i.e. one suffix is a full prefix of the other.
# Ties (identical suffixes) need no order pin: any permutation of an
# equal block yields the same adjacent-LCP multiset.
SQL_REPEATED_SPANS = r"""
WITH toks AS (
  SELECT doc_id AS d,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS ts
  FROM documents
), nz AS (
  SELECT d, ts, len(ts) AS l FROM toks WHERE len(ts) > 0
), suf AS (
  SELECT d, CAST(i - 1 AS BIGINT) AS i, ts[i:] AS s,
         CAST(l - i + 1 AS BIGINT) AS slen
  FROM nz, LATERAL unnest(generate_series(1, l)) AS u(i)
), ord AS (
  SELECT s, slen, d, i,
         lead(s)    OVER w AS s2,
         lead(slen) OVER w AS slen2
  FROM suf
  WINDOW w AS (ORDER BY s, d, i)
)
SELECT CAST(coalesce(
         nullif(list_position(
           list_transform(generate_series(1, CAST(least(slen, slen2) AS INT)),
                          j -> s[j] = s2[j]),
           false), 0) - 1,
         least(slen, slen2)) AS BIGINT) AS lcp,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM ord WHERE s2 IS NOT NULL
GROUP BY 1"""


DUP_SPAN_MIN_LEN = 5


def q_dup_span_stats(spark, sf_dir):
    """ExactSubstr dedup accounting: per document, the token mass
    sitting inside a ≥5-token span that occurs again anywhere in the
    corpus — exactly what a suffix-array dedup pass (Lee et al. 2021)
    would cut. Suffix spans from the q105 machinery; coverage is a
    per-document interval-union window (partitioned on the
    high-cardinality doc key)."""
    from unarxive_spark.operators.suffixarray import duplicated_span_stats

    return duplicated_span_stats(
        _t(spark, sf_dir, "documents"), min_len=DUP_SPAN_MIN_LEN
    )


# Same suffix-sort + first-mismatch LCP replay as SQL_REPEATED_SPANS,
# extended to both pair endpoints: span(d,i) = max LCP with the two
# SA-order neighbors (= longest repeat starting at i), then per-doc
# union of [i, i+span) intervals via a running-max window.
SQL_DUP_SPAN_STATS = rf"""
WITH toks AS (
  SELECT doc_id AS d,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS ts
  FROM documents
), nz AS (
  SELECT d, ts, len(ts) AS l FROM toks WHERE len(ts) > 0
), suf AS (
  SELECT d, CAST(i - 1 AS BIGINT) AS i, ts[i:] AS s,
         CAST(l - i + 1 AS BIGINT) AS slen
  FROM nz, LATERAL unnest(generate_series(1, l)) AS u(i)
), ord AS (
  SELECT d, i, s, slen,
         lead(d)    OVER w AS qd,
         lead(i)    OVER w AS qi,
         lead(s)    OVER w AS s2,
         lead(slen) OVER w AS slen2
  FROM suf
  WINDOW w AS (ORDER BY s, d, i)
), pairs AS (
  SELECT d AS pd, i AS pi, qd, qi,
         CAST(coalesce(
           nullif(list_position(
             list_transform(
               generate_series(1, CAST(least(slen, slen2) AS INT)),
               j -> s[j] = s2[j]),
             false), 0) - 1,
           least(slen, slen2)) AS BIGINT) AS lcp
  FROM ord WHERE qd IS NOT NULL
), ends AS (
  SELECT pd AS d, pi AS i, lcp FROM pairs
  UNION ALL
  SELECT qd AS d, qi AS i, lcp FROM pairs
), spans AS (
  SELECT d, i, max(lcp) AS span
  FROM ends GROUP BY 1, 2
  HAVING max(lcp) >= {DUP_SPAN_MIN_LEN}
), cov AS (
  SELECT d, sum(greatest(0, i + span - greatest(prev_end, i))) AS dup
  FROM (
    SELECT d, i, span,
           coalesce(max(i + span) OVER (
             PARTITION BY d ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS prev_end
    FROM spans)
  GROUP BY 1
)
SELECT nz.d AS doc_id,
       CAST(nz.l AS BIGINT) AS n_tokens,
       CAST(coalesce(cov.dup, 0) AS BIGINT) AS dup_tokens,
       round(CAST(coalesce(cov.dup, 0) AS DOUBLE) / nz.l, 6) AS dup_frac
FROM nz LEFT JOIN cov ON nz.d = cov.d"""


KN_MIN_COUNT = 2


def q_kneser_ney(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM over the documents corpus
    (operators/corpus.py) — all model statistics are exact integers;
    the smoothed probability is one fixed float expression written
    with identical association in both engines (D = 0.75 is
    binary-exact), rounded to 6."""
    from unarxive_spark.operators.corpus import kneser_ney_bigram

    return kneser_ney_bigram(
        _t(spark, sf_dir, "documents"), min_count=KN_MIN_COUNT
    )


def _sql_kneser_ney() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH d AS (SELECT {tok} AS toks FROM documents),
bi AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM d
),
cb AS (
  SELECT split_part(bg, ' ', 1) AS w1,
         split_part(bg, ' ', 2) AS w2,
         CAST(count(*) AS BIGINT) AS c12
  FROM bi GROUP BY 1, 2
),
lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n_follow
        FROM cb GROUP BY 1),
prc AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_prec
        FROM cb GROUP BY 1),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM cb)
SELECT w1, w2, c12, c1, n_follow, n_prec,
       round(greatest(CAST(c12 AS DOUBLE) - 0.75e0, 0e0) / c1
             + (0.75e0 * n_follow / c1)
               * (CAST(n_prec AS DOUBLE) / n_types), 6) AS pkn
FROM cb JOIN lft USING (w1) JOIN prc USING (w2), nt
WHERE c12 >= {KN_MIN_COUNT}"""


SQL_KNESER_NEY = _sql_kneser_ney()


SNM_WINDOW = 5
SNM_KEY_TOKENS = 4
SNM_THRESHOLD = 0.8


def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup (Hernández-Stolfo): global sort by
    the first-4-token blocking key (de-skewed rank, same machinery as
    the suffix array), candidates = EQUI-join on rank+offset within a
    5-record window, exact token-set Jaccard verify. Catches near-dups
    whose keys are close-but-not-equal — the complement of the hash
    blocking in q31/q32/q33."""
    from unarxive_spark.operators.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        _t(spark, sf_dir, "documents"),
        window=SNM_WINDOW,
        key_tokens=SNM_KEY_TOKENS,
        threshold=SNM_THRESHOLD,
    )


def _sql_sorted_neighborhood() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH base AS (
  SELECT id,
         array_to_string(list_slice(ts, 1, {SNM_KEY_TOKENS}), ' ') AS k,
         list_sort(list_distinct(ts)) AS s,
         CAST(len(list_distinct(ts)) AS BIGINT) AS nd
  FROM (SELECT doc_id AS id, {tok} AS ts FROM documents)
  WHERE len(ts) > 0
),
rnk AS (SELECT id, s, nd,
               CAST(row_number() OVER (ORDER BY k, id) AS BIGINT) AS r
        FROM base),
scored AS (
  SELECT l.id AS a, rr.id AS b, rr.r - l.r AS rank_dist,
         CAST(len(list_filter(l.s, t -> list_contains(rr.s, t)))
              AS BIGINT) AS n_common,
         l.nd AS na, rr.nd AS nb
  FROM rnk l JOIN rnk rr
    ON rr.r > l.r AND rr.r <= l.r + {SNM_WINDOW - 1}
)
SELECT a, b, rank_dist, n_common,
       round(CAST(n_common AS DOUBLE) / (na + nb - n_common), 6) AS jac
FROM scored
WHERE CAST(n_common AS DOUBLE) / (na + nb - n_common)
      >= {SNM_THRESHOLD}e0"""


SQL_SORTED_NEIGHBORHOOD = _sql_sorted_neighborhood()


CONC_GAP_S = 1800


def q_daily_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day (operators/intervals.py):
    30-min-gap session intervals → half-open sweep-line breakpoints →
    de-skewed global running sum (hour-shard prefix sum + broadcast
    hour offsets, never a single-partition data-sized window) → per-day
    max + earliest attaining breakpoint. Exact integer microseconds
    end to end."""
    from unarxive_spark.operators.intervals import (
        daily_max_concurrency,
        interval_concurrency,
        session_intervals,
    )

    iv = session_intervals(_t(spark, sf_dir, "events"), gap_s=CONC_GAP_S)
    return daily_max_concurrency(interval_concurrency(iv))


SQL_DAILY_CONCURRENCY = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
se AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {CONC_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
sid AS (
  SELECT user_id, us,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM se
),
iv AS (
  SELECT user_id, session_id, min(us) AS start_us,
         max(us) + 1000000 AS end_us
  FROM sid GROUP BY 1, 2
),
bp AS (
  SELECT start_us AS us, CAST(1 AS BIGINT) AS delta,
         user_id, session_id FROM iv
  UNION ALL
  SELECT end_us, CAST(-1 AS BIGINT), user_id, session_id FROM iv
),
sw AS (
  SELECT us, sum(delta) OVER (ORDER BY us, delta, user_id, session_id
                              ROWS UNBOUNDED PRECEDING) AS conc
  FROM bp
),
dd AS (
  SELECT strftime(make_timestamp(us), '%Y-%m-%d') AS day, us, conc
  FROM sw
),
mx AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_breakpoints,
         max(conc) AS m
  FROM dd GROUP BY 1
)
SELECT mx.day, mx.n_breakpoints, CAST(mx.m AS BIGINT) AS max_concurrent,
       CAST(min(dd.us) AS BIGINT) AS at_us
FROM mx JOIN dd ON dd.day = mx.day AND dd.conc = mx.m
GROUP BY 1, 2, 3"""


SKIPGRAM_WINDOW = 3
SKIPGRAM_MIN_COUNT = 5


def q_skipgram_pmi(spark, sf_dir):
    """Skip-gram window co-occurrence PMI (operators/corpus.py):
    ordered token pairs at distance 1..3 — the word2vec-context
    association measure next to q95's adjacent bigrams. Pair
    generation is row-local (nested HOF), counts exact integers, pmi
    the only float (identical expression both engines)."""
    from unarxive_spark.operators.corpus import skipgram_pmi

    return skipgram_pmi(
        _t(spark, sf_dir, "documents"),
        window=SKIPGRAM_WINDOW,
        min_count=SKIPGRAM_MIN_COUNT,
    )


def _sql_skipgram_pmi() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH d AS (SELECT {tok} AS toks FROM documents),
uni AS (SELECT unnest(toks) AS t FROM d),
cu AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM uni),
pr AS (
  SELECT unnest(flatten(list_transform(
           range(1, least({SKIPGRAM_WINDOW}, len(toks) - 1) + 1),
           o -> list_transform(range(1, len(toks) - o + 1),
                               i -> toks[i] || ' ' || toks[i + o])))) AS pg
  FROM d WHERE len(toks) >= 2
),
cp AS (
  SELECT split_part(pg, ' ', 1) AS token_a,
         split_part(pg, ' ', 2) AS token_b,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM pr GROUP BY 1, 2
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pr)
SELECT token_a, token_b, c_ab, ca.c AS c_a, cbt.c AS c_b,
       round(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni)
                / (CAST(n_pairs AS DOUBLE) * ca.c * cbt.c)), 6) AS pmi
FROM cp
JOIN cu ca ON ca.t = token_a
JOIN cu cbt ON cbt.t = token_b, nu, np
WHERE c_ab >= {SKIPGRAM_MIN_COUNT}"""


SQL_SKIPGRAM_PMI = _sql_skipgram_pmi()


DSIR_BUCKETS = 1024
DSIR_TARGET = ("src0", "src1")


def q_dsir_scores(spark, sf_dir):
    """DSIR importance scores (operators/corpus.py): hashed-unigram
    log-likelihood ratio of a target-slice LM (source src0/src1) vs
    the pool LM, per pool document. Per-bucket integer weights
    (round(1e6·ln ratio) as BIGINT) make the doc score an exact
    integer sum — order-independent across engines."""
    from unarxive_spark.operators.corpus import dsir_scores

    d = _t(spark, sf_dir, "documents").withColumn(
        "is_target", F.col("source").isin(*DSIR_TARGET)
    )
    return dsir_scores(d, n_buckets=DSIR_BUCKETS)


def _sql_dsir_scores() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    tgt = "source IN ('src0', 'src1')"
    hb = h64_sql("t")
    b = DSIR_BUCKETS
    return f"""
WITH ex AS (
  SELECT doc_id, tgt, {hb} % {b} AS b
  FROM (SELECT doc_id, {tgt} AS tgt, unnest({tok}) AS t FROM documents)
),
pb AS (
  SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr
  FROM ex GROUP BY 1
),
tot AS (
  SELECT sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tt,
         sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS tr
  FROM ex
),
w AS (
  SELECT b,
         CAST(round(1e6 * ln((CAST(ct + 1 AS DOUBLE) * (tr + {b}e0))
                             / (CAST(cr + 1 AS DOUBLE) * (tt + {b}e0))))
              AS BIGINT) AS wgt
  FROM pb, tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(wgt) AS BIGINT) AS score_e6,
       round(sum(wgt) / 1e6, 6) AS score
FROM ex JOIN w USING (b)
WHERE NOT tgt GROUP BY 1"""


SQL_DSIR_SCORES = _sql_dsir_scores()


FUNNEL_MIN_TOKENS = 5
FUNNEL_MAX_CHARS = 2000
FUNNEL_MIN_QUALITY = 0.5
FUNNEL_LANGS = ("de", "en", "es", "fr")


def q_quality_funnel(spark, sf_dir):
    """FineWeb-style quality-gate funnel audit: four sequential filter
    rules (min tokens, max chars, quality score, language allowlist)
    over documents, reporting n_in/n_rejected/n_out per rule — the
    per-rule rejection accounting every corpus-prep pipeline publishes.
    One row-local boolean pass + one aggregate; the 4-row output is
    exploded from the single agg row (no second scan per rule)."""
    d = _t(spark, sf_dir, "documents")
    b1 = token_count("text") >= FUNNEL_MIN_TOKENS
    b2 = F.col("n_chars") <= FUNNEL_MAX_CHARS
    b3 = quality_score("text") >= FUNNEL_MIN_QUALITY
    b4 = F.col("lang").isin(*FUNNEL_LANGS)
    agg = d.select(
        b1.alias("b1"), b2.alias("b2"), b3.alias("b3"), b4.alias("b4")
    ).agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.when(F.col("b1"), 1).otherwise(0)).alias("s1"),
        F.sum(
            F.when(F.col("b1") & F.col("b2"), 1).otherwise(0)
        ).alias("s2"),
        F.sum(
            F.when(F.col("b1") & F.col("b2") & F.col("b3"), 1).otherwise(0)
        ).alias("s3"),
        F.sum(
            F.when(
                F.col("b1") & F.col("b2") & F.col("b3") & F.col("b4"), 1
            ).otherwise(0)
        ).alias("s4"),
    )
    rules = ("min_tokens", "max_chars", "quality", "lang")

    def _row(i: int) -> F.Column:
        return F.struct(
            F.lit(i + 1).cast("long").alias("rule_idx"),
            F.lit(rules[i]).alias("rule"),
            F.col(f"s{i}").alias("n_in"),
            (F.col(f"s{i}") - F.col(f"s{i + 1}")).alias("n_rejected"),
            F.col(f"s{i + 1}").alias("n_out"),
        )

    return agg.select(
        F.explode(F.array(*[_row(i) for i in range(4)])).alias("_r")
    ).select("_r.*")


def _sql_quality_funnel() -> str:
    tc = token_count_sql("text")
    qs = quality_score_sql("text")
    langs = ", ".join(f"'{x}'" for x in FUNNEL_LANGS)
    rows = []
    rules = ("min_tokens", "max_chars", "quality", "lang")
    for i, rule in enumerate(rules):
        rows.append(
            f"SELECT CAST({i + 1} AS BIGINT) AS rule_idx, '{rule}' AS rule,"
            f" s{i} AS n_in, s{i} - s{i + 1} AS n_rejected,"
            f" s{i + 1} AS n_out FROM f"
        )
    return f"""
WITH b AS (
  SELECT {tc} >= {FUNNEL_MIN_TOKENS} AS b1,
         n_chars <= {FUNNEL_MAX_CHARS} AS b2,
         {qs} >= {FUNNEL_MIN_QUALITY} AS b3,
         lang IN ({langs}) AS b4
  FROM documents
),
f AS (
  SELECT CAST(count(*) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN b1 AND b2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN b1 AND b2 AND b3 THEN 1 ELSE 0 END)
              AS BIGINT) AS s3,
         CAST(sum(CASE WHEN b1 AND b2 AND b3 AND b4 THEN 1 ELSE 0 END)
              AS BIGINT) AS s4
  FROM b
)
{" UNION ALL ".join(rows)}"""


SQL_QUALITY_FUNNEL = _sql_quality_funnel()


PHRASE_N = 3


def q_phrase_search(spark, sf_dir):
    """Positional phrase search (operators/corpus.py): the corpus's
    argmax 3-gram (tie → lexicographic min) and every (doc, position)
    occurrence — the inverted positional index probe. Row-local gram
    generation + two 1-row scalar aggregates + one broadcast join."""
    from unarxive_spark.operators.corpus import top_phrase_occurrences

    return top_phrase_occurrences(
        _t(spark, sf_dir, "documents"), n=PHRASE_N
    )


def _sql_phrase_search() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    n = PHRASE_N
    return f"""
WITH d AS (SELECT doc_id, {tok} AS toks FROM documents),
g AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(list_slice(toks, i, i + {n} - 1), ' ') AS phrase
  FROM d, LATERAL unnest(generate_series(1, len(toks) - {n} + 1)) AS s(i)
  WHERE len(toks) >= {n}
),
c AS (SELECT phrase, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY 1),
b AS (
  SELECT min(phrase) AS phrase, max(c) AS n_total
  FROM c WHERE c = (SELECT max(c) FROM c)
)
SELECT g.doc_id, g.pos, g.phrase, CAST(b.n_total AS BIGINT) AS n_total
FROM g JOIN b ON g.phrase = b.phrase"""


SQL_PHRASE_SEARCH = _sql_phrase_search()


HLL_REGS = 64


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct event_ids per event_type
    (operators/sketch.py): max-rho registers with stochastic
    averaging — the mergeable successor to q59's FM/PCSA bitmaps. The
    harmonic-mean numerator is an exact BIGINT (absent registers count
    2^55), value-checked bit-for-bit; the estimate is one shared float
    expression with the standard linear-counting small-range branch."""
    from unarxive_spark.operators.sketch import hll_sketch

    return hll_sketch(
        _t(spark, sf_dir, "events"),
        key_col="event_id",
        group_cols=["event_type"],
        n_regs=HLL_REGS,
    )


def _sql_hll_distinct() -> str:
    from unarxive_spark.operators.sketch import hll_sketch_sql

    return hll_sketch_sql(
        "events", "event_id", ["event_type"], n_regs=HLL_REGS
    )


SQL_HLL_DISTINCT = _sql_hll_distinct()


def q_state_history(spark, sf_dir):
    """Gaps-and-islands SCD2 version history (operators/intervals.py):
    each user's event_type stream collapsed to half-open
    valid_from/valid_to version rows — the slowly-changing-dimension
    build. One per-key window pass + one groupBy; no self-join."""
    from unarxive_spark.operators.intervals import state_history

    return state_history(_t(spark, sf_dir, "events"))


SQL_STATE_HISTORY = """
WITH ev AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS us, event_id
  FROM events
),
ch AS (
  SELECT user_id, state, us, event_id,
         CASE WHEN lag(state) OVER w IS NULL
                OR state != lag(state) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
ver AS (
  SELECT user_id, state, us,
         sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM ch
),
hist AS (
  SELECT user_id, CAST(version AS BIGINT) AS version, state,
         min(us) AS valid_from_us, CAST(count(*) AS BIGINT) AS n_events
  FROM ver GROUP BY 1, 2, 3
)
SELECT user_id, version, state,
       CAST(valid_from_us AS BIGINT) AS valid_from_us,
       CAST(lead(valid_from_us) OVER w2 AS BIGINT) AS valid_to_us,
       n_events,
       CAST(CASE WHEN lead(valid_from_us) OVER w2 IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM hist WINDOW w2 AS (PARTITION BY user_id ORDER BY version)"""


def q_funnel(spark, sf_dir):
    """Ordered-sequence funnel (view → click → purchase): per user the
    earliest view, the earliest click strictly after it, the earliest
    purchase strictly after that — three conditional-min aggregates
    chained by join, no per-user sort or pattern-match UDF. Counts
    users surviving each stage."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    rows = [
        v.agg(F.lit("1_view").alias("stage"),
              F.count(F.lit(1)).alias("n_users")),
        c.agg(F.lit("2_view_click").alias("stage"),
              F.count(F.lit(1)).alias("n_users")),
        p.agg(F.lit("3_view_click_purchase").alias("stage"),
              F.count(F.lit(1)).alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


SQL_FUNNEL = """
WITH fv AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
fc AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN fv USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > fv.t_view GROUP BY 1
),
fp AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN fc USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > fc.t_click GROUP BY 1
)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM fv
UNION ALL
SELECT '2_view_click', CAST(count(*) AS BIGINT) FROM fc
UNION ALL
SELECT '3_view_click_purchase', CAST(count(*) AS BIGINT) FROM fp"""


def q_cohorts(spark, sf_dir):
    """Cohort retention matrix: users bucketed by first-event DAY,
    counted distinct per (cohort day, activity day) — the synthetic
    events span ~8 days, so daily cohorts give a real matrix where
    monthly would collapse to 1×1. Two map-side-combinable aggs + one
    join; day keys as strings so both engines compare identically."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("t0", "yyyy-MM-dd").alias("cohort"),
            F.date_format("ts", "yyyy-MM-dd").alias("act_day"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


SQL_COHORTS = """
WITH f0 AS (SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1)
SELECT strftime(t0, '%Y-%m-%d') AS cohort,
       strftime(ts, '%Y-%m-%d') AS act_day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN f0 USING (user_id)
GROUP BY 1, 2"""


CONTAINMENT_T = 0.8


def q_containment_pairs(spark, sf_dir):
    """Directional containment near-dups (C(A→B) = |A∩B|/|A|): catches
    a short document embedded verbatim in a longer one, which symmetric
    Jaccard scores near 0. Oracle: the same inverted-index counting in
    DuckDB."""
    from unarxive_spark.operators.dedup import containment_pairs

    d = _t(spark, sf_dir, "documents")
    return containment_pairs(d, threshold=CONTAINMENT_T).select(
        "id_a",
        "id_b",
        F.round("cont_a_in_b", 6).alias("cont_a_in_b"),
        F.round("cont_b_in_a", 6).alias("cont_b_in_a"),
    )


SQL_CONTAINMENT_PAIRS = f"""
WITH sh AS (
  SELECT DISTINCT doc_id AS id, unnest({_shingles_sql("text")}) AS shingle
  FROM documents
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
shared AS (
  SELECT l.id AS id_a, r.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.id < r.id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n_shared AS DOUBLE) / sa.n_sh, 6) AS cont_a_in_b,
       round(CAST(n_shared AS DOUBLE) / sb.n_sh, 6) AS cont_b_in_a
FROM shared
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE GREATEST(CAST(n_shared AS DOUBLE) / sa.n_sh,
               CAST(n_shared AS DOUBLE) / sb.n_sh) >= {CONTAINMENT_T!r}e0"""


SAMPLE_K = 20


def q_priority_sample(spark, sf_dir):
    """Deterministic per-group bottom-k sample (h64 priority order,
    two-stage de-skewed rank). The uniform-sample primitive a
    training-data pipeline needs next to the stratified split — and
    reruns reproduce it row-for-row."""
    from unarxive_spark.operators.mltasks import priority_sample

    d = _t(spark, sf_dir, "documents")
    return priority_sample(
        d.select("lang", "doc_id"), SAMPLE_K, ["lang"], "doc_id"
    )


def _sql_priority_sample() -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)")
    return f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {h}, doc_id) AS rk
  FROM documents
) WHERE rk <= {SAMPLE_K}"""


SQL_PRIORITY_SAMPLE = _sql_priority_sample()


WSAMPLE_K = 15
# integer weight 1..32 favoring longer documents — exact integer
# division so both engines derive the identical weight
WSAMPLE_W_SPARK = "1 + LEAST(31, n_chars DIV 400)"
WSAMPLE_W_DUCK = "1 + LEAST(31, n_chars // 400)"


def q_weighted_priority_sample(spark, sf_dir):
    """Efraimidis-Spirakis weighted sampling without replacement
    (operators/mltasks.py:weighted_priority_sample): longer documents
    are proportionally likelier to be kept. The float u^(1/w) key is
    replaced by integer weight replication — priority(i) = min over
    j<w_i of h64(doc_id#j) — so the sample is an exact integer function
    of the data and the DuckDB oracle reproduces it row-for-row."""
    from unarxive_spark.operators.mltasks import weighted_priority_sample

    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "doc_id",
        F.expr(WSAMPLE_W_SPARK).cast("long").alias("w"),
    )
    return weighted_priority_sample(
        base, WSAMPLE_K, ["lang"], "doc_id", "w", max_weight=32
    )


def _sql_weighted_priority_sample() -> str:
    from unarxive_spark.functions.hashing import h64_sql

    h = h64_sql("CAST(doc_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)")
    return f"""
WITH wb AS (
  SELECT lang, doc_id, CAST({WSAMPLE_W_DUCK} AS BIGINT) AS w
  FROM documents
),
pri AS (
  SELECT lang, doc_id, w,
         list_min(list_transform(range(0, CAST(w AS INT)),
                                 j -> {h})) AS p
  FROM wb
)
SELECT lang, doc_id, w FROM (
  SELECT lang, doc_id, w,
         row_number() OVER (PARTITION BY lang
                            ORDER BY p, doc_id) AS rk
  FROM pri
) WHERE rk <= {WSAMPLE_K}"""


SQL_WEIGHTED_PRIORITY_SAMPLE = _sql_weighted_priority_sample()


def q_edit_distance_pairs(spark, sf_dir):
    """SymSpell edit-distance candidate join (operators/editjoin.py):
    deletion-neighborhood keys → equi-join → exact levenshtein verify.
    Customer names are sequential IDs, so single-digit substitutions
    produce a dense distance-1 pair set — the fuzzy-match primitive the
    reference implements as the title cascade's drop-token retry."""
    from unarxive_spark.operators.editjoin import symspell_join

    c = _t(spark, sf_dir, "customer")
    return symspell_join(c, "c_name", max_distance=1).select(
        F.col("a").alias("name_a"),
        F.col("b").alias("name_b"),
        "dist",
    )


CHUNK_TOKENS, CHUNK_OVERLAP = 32, 8
_CH_STEP = CHUNK_TOKENS - CHUNK_OVERLAP


def q_chunk_documents(spark, sf_dir):
    """Sliding token-window chunking (operators/corpus.py): the
    document→training-chunk stage of an LLM data pipeline. Chunk
    generation is row-local (HOF transform + slice + explode) — the
    operator adds no shuffle."""
    from unarxive_spark.operators.corpus import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(
        d, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


SQL_CHUNK_DOCUMENTS = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
),
b2 AS (
  SELECT doc_id, toks,
         1 + (GREATEST(len(toks) - {CHUNK_TOKENS}, 0)
              + {_CH_STEP - 1}) // {_CH_STEP} AS n_chunks
  FROM base
),
ex AS (
  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS ci FROM b2
)
SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       CAST(len(toks[ci * {_CH_STEP} + 1 :
                     ci * {_CH_STEP} + {CHUNK_TOKENS}]) AS BIGINT)
         AS n_tokens,
       array_to_string(toks[ci * {_CH_STEP} + 1 :
                            ci * {_CH_STEP} + {CHUNK_TOKENS}], ' ')
         AS chunk_text
FROM ex"""


PACK_CAPACITY, PACK_SHARDS = 256, 32


def q_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing (operators/corpus.py): lay
    the corpus out in the deterministic (h64 shard, h64, id) stream
    order and cut every PACK_CAPACITY tokens — the LLM pretraining
    layout. The global prefix sum is de-skewed (within-shard window +
    broadcast shard offsets); the oracle replays the identical total
    order with one window."""
    from unarxive_spark.operators.corpus import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(
        d, capacity=PACK_CAPACITY, n_shards=PACK_SHARDS
    )


def _sql_pack_sequences() -> str:
    from unarxive_spark.functions.hashing import h64_sql
    from unarxive_spark.functions.texttools import token_count_sql

    h = h64_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (
  SELECT doc_id, CAST({token_count_sql("text")} AS BIGINT) AS n_tokens,
         {h} AS h
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY h % {PACK_SHARDS}, h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM base
)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // {PACK_CAPACITY} AS BIGINT) AS first_seq,
       CAST((start_offset + GREATEST(n_tokens - 1, 0))
            // {PACK_CAPACITY} AS BIGINT) AS last_seq
FROM cum"""


SQL_PACK_SEQUENCES = _sql_pack_sequences()


DECONTAM_N = 4
DECONTAM_BENCH_MOD = 97


def q_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination (operators/corpus.py): drop
    training documents sharing any word 4-gram with the held-out
    benchmark slice (doc_id % 97 == 0) — the test-set leakage scrub
    every published LLM data pipeline runs. One shingle-hash semi-join
    + left_anti."""
    from unarxive_spark.operators.corpus import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(
        F.col("doc_id") % DECONTAM_BENCH_MOD == 0
    )
    train = d.filter(
        F.col("doc_id") % DECONTAM_BENCH_MOD != 0
    )
    return decontaminate(train, bench, n=DECONTAM_N).select("doc_id")


def _sql_decontaminate() -> str:
    from unarxive_spark.functions.hashing import h64_sql

    n = DECONTAM_N
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    h = h64_sql("s")
    return f"""
WITH d AS (SELECT doc_id, {tok} AS toks FROM documents),
sh AS (
  SELECT doc_id, {h} AS hs FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(0, GREATEST(len(toks) - {n} + 1, 1)),
             i -> array_to_string(toks[i + 1 : i + {n}], ' ')))) AS s
    FROM d)
),
bench AS (
  SELECT DISTINCT hs FROM sh WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
),
contaminated AS (
  SELECT DISTINCT sh.doc_id FROM sh JOIN bench USING (hs)
  WHERE sh.doc_id % {DECONTAM_BENCH_MOD} != 0
)
SELECT doc_id FROM documents
WHERE doc_id % {DECONTAM_BENCH_MOD} != 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)"""


SQL_DECONTAMINATE = _sql_decontaminate()


BM25_TERMS = ["join", "spark", "window"]
BM25_K1, BM25_B = 1.2, 0.75


def q_bm25(spark, sf_dir):
    """Okapi BM25 ranking (operators/corpus.py) of documents against a
    fixed term list. Counts (tf/df/dl/N) are exact integers; the score
    is the only float (rounded to 6 on both engines)."""
    from unarxive_spark.operators.corpus import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return bm25_scores(d, BM25_TERMS, k1=BM25_K1, b=BM25_B)


def _sql_bm25() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_TERMS)))
    k1, b = BM25_K1, BM25_B
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH d2 AS (
  SELECT doc_id, {tok} AS toks,
         CAST(len({tok}) AS BIGINT) AS dl
  FROM documents
),
tf AS (
  SELECT doc_id, dl, t AS term,
         CAST(len(list_filter(toks, x -> x = t)) AS BIGINT) AS tf
  FROM d2 CROSS JOIN unnest([{terms}]) AS u(t)
  WHERE list_contains(toks, t)
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
sc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM d2
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       round(sum(
         ln(1e0 + (n_docs - df + 0.5e0) / (df + 0.5e0))
         * tf * {k1 + 1.0}e0
         / (tf + {k1}e0 * ({1.0 - b}e0 + {b}e0 * dl / avgdl))
       ), 6) AS bm25
FROM tf JOIN dfreq USING (term), sc
GROUP BY doc_id"""


SQL_BM25 = _sql_bm25()


PMI_MIN_COUNT = 5


def q_bigram_pmi(spark, sf_dir):
    """Adjacent-bigram PMI phrase mining (operators/corpus.py) — the
    word2phrase-style collocation pass of tokenizer/vocab building.
    Exact integer counts pin the row set; the pmi value is the only
    float (identical left-associated expression in both engines,
    rounded to 6)."""
    from unarxive_spark.operators.corpus import bigram_pmi

    d = _t(spark, sf_dir, "documents")
    return bigram_pmi(d, min_count=PMI_MIN_COUNT)


def _sql_bigram_pmi() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH d AS (SELECT {tok} AS toks FROM documents),
uni AS (SELECT unnest(toks) AS t FROM d),
cu AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM uni),
bi AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM d
),
cb AS (
  SELECT split_part(bg, ' ', 1) AS token_a,
         split_part(bg, ' ', 2) AS token_b,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM bi GROUP BY 1, 2
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bi FROM bi)
SELECT token_a, token_b, c_ab, ca.c AS c_a, cbt.c AS c_b,
       round(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni)
                / (CAST(n_bi AS DOUBLE) * ca.c * cbt.c)), 6) AS pmi
FROM cb
JOIN cu ca ON ca.t = token_a
JOIN cu cbt ON cbt.t = token_b, nu, nb
WHERE c_ab >= {PMI_MIN_COUNT}"""


SQL_BIGRAM_PMI = _sql_bigram_pmi()


TFIDF_MIN_SHARED = 1
TFIDF_MAX_DF = 50


def q_tfidf_pairs(spark, sf_dir):
    """TF-IDF doc-pair cosine (operators/corpus.py): inverted-index
    candidates with impact-ordered stop-term pruning (terms with
    df > 50 drop from the index — on this corpus that keeps only the
    rare discriminative term, exactly the regime the prune exists for),
    full-vocabulary norms, integer-gated row set."""
    from unarxive_spark.operators.corpus import tfidf_doc_pairs

    d = _t(spark, sf_dir, "documents")
    return tfidf_doc_pairs(
        d, min_shared=TFIDF_MIN_SHARED, max_df=TFIDF_MAX_DF
    )


def _sql_tfidf_pairs() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH tf AS (
  SELECT id, t, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id AS id, unnest({tok}) AS t FROM documents
  ) GROUP BY 1, 2
),
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM documents),
w AS (
  SELECT id, t, df,
         CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df) AS w
  FROM tf JOIN dfreq USING (t), nd
),
norms AS (SELECT id, sqrt(sum(w * w)) AS norm FROM w GROUP BY 1),
idx AS (SELECT * FROM w WHERE df <= {TFIDF_MAX_DF}),
pairs AS (
  SELECT l.id AS id_a, r.id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared, sum(l.w * r.w) AS dot
  FROM idx l JOIN idx r ON l.t = r.t AND l.id < r.id
  GROUP BY 1, 2 HAVING count(*) >= {TFIDF_MIN_SHARED}
)
SELECT id_a, id_b, n_shared,
       round(dot / (na.norm * nb.norm), 6) AS cosine
FROM pairs
JOIN norms na ON na.id = id_a
JOIN norms nb ON nb.id = id_b"""


SQL_TFIDF_PAIRS = _sql_tfidf_pairs()


DUPSPAN_WINDOW = 8


def q_duplicate_spans(spark, sf_dir):
    """Exact duplicate-span detection (operators/corpus.py): the
    window-hash form of ExactSubstr dedup (Lee et al. 2021) — every
    8-token sliding window hashed, a window is duplicated if its hash
    occurs at >1 corpus position. The substring-level dedup signal the
    document-level family (exact/MinHash/SimHash) cannot see."""
    from unarxive_spark.operators.corpus import duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return duplicate_spans(d, window=DUPSPAN_WINDOW)


def _sql_duplicate_spans() -> str:
    from unarxive_spark.functions.hashing import h64_sql

    w = DUPSPAN_WINDOW
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    h = h64_sql("s")
    return f"""
WITH d AS (SELECT doc_id, {tok} AS toks FROM documents),
wins AS (
  SELECT doc_id, {h} AS wh FROM (
    SELECT doc_id, array_to_string(toks[i + 1 : i + {w}], ' ') AS s
    FROM d, unnest(range(0, GREATEST(len(toks) - {w}, 0) + 1)) AS u(i))
),
dups AS (
  SELECT wh FROM (SELECT wh, count(*) AS c FROM wins GROUP BY 1)
  WHERE c > 1
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         CAST(count(*) FILTER (wh IN (SELECT wh FROM dups)) AS BIGINT)
           AS n_dup_windows
  FROM wins GROUP BY 1
)
SELECT doc_id, n_windows, n_dup_windows,
       round(CAST(n_dup_windows AS DOUBLE) / n_windows, 6) AS dup_frac
FROM per_doc"""


SQL_DUPLICATE_SPANS = _sql_duplicate_spans()


SQL_EDIT_DISTANCE_PAIRS = """
WITH names AS (
  SELECT DISTINCT c_name AS s FROM customer WHERE length(c_name) > 1
),
keys AS (
  SELECT s, unnest(list_distinct(list_prepend(s,
           list_transform(range(1, length(s) + 1),
             i -> substr(s, 1, i - 1) || substr(s, i + 1, length(s)))
         ))) AS k
  FROM names
),
cand AS (
  SELECT DISTINCT a.s AS name_a, b.s AS name_b
  FROM keys a JOIN keys b ON a.k = b.k AND a.s < b.s
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM cand WHERE levenshtein(name_a, name_b) <= 1"""


VOCAB_K = 50


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-k: whitespace tokens (same tokenizer as
    the q27 text features), global counts, deterministic order
    (count desc, token asc) — the vocab-building pass of a tokenizer
    training pipeline, as one explode + map-side-combinable count +
    TakeOrderedAndProject."""
    from unarxive_spark.functions.texttools import tokens

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(VOCAB_K)
    )


SQL_VOCAB_TOPK = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(list_filter(
           string_split_regex(trim(lower(text)), '\\s+'),
           t -> t != '')) AS token
  FROM documents
) GROUP BY 1
ORDER BY n DESC, token ASC
LIMIT {VOCAB_K}"""


SQL_RANGE_JOIN = """
SELECT e.event_id, e.user_id,
       CAST(count(p.pid) AS BIGINT) AS n_purchases,
       round(coalesce(sum(p.value), 0e0), 6) AS purchase_value
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'error') e
LEFT JOIN (SELECT event_id AS pid, user_id, ts, value FROM events
           WHERE event_type = 'purchase') p
  ON p.user_id = e.user_id
 AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
GROUP BY 1, 2"""


AR_MIN_ITEM = 5
AR_MIN_PAIR = 2


def q_association_rules(spark, sf_dir):
    """A-priori 2-itemset association rules (operators/itemsets.py) over
    order baskets: broadcast frequent-item prune, one basket-key
    self-join, exact-integer support/confidence/lift. The co-occurrence
    mining analog of the reference's co-citation statistics, generalized
    to directed rules."""
    from unarxive_spark.operators.itemsets import association_rules

    return association_rules(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_item_support=AR_MIN_ITEM,
        min_pair_support=AR_MIN_PAIR,
    )


SQL_ASSOCIATION_RULES = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM b),
ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ic FROM b GROUP BY 1),
fi AS MATERIALIZED (SELECT i, ic FROM ic WHERE ic >= {AR_MIN_ITEM}),
pb AS MATERIALIZED (
  SELECT bk, i FROM b WHERE i IN (SELECT i FROM fi)
),
pr AS (
  SELECT l.i AS ia, r.i AS ib, CAST(count(*) AS BIGINT) AS pc
  FROM pb l JOIN pb r ON l.bk = r.bk AND l.i < r.i
  GROUP BY 1, 2 HAVING count(*) >= {AR_MIN_PAIR}
),
ru AS (
  SELECT ia AS antecedent, ib AS consequent, pc FROM pr
  UNION ALL
  SELECT ib, ia, pc FROM pr
)
SELECT antecedent, consequent, pc AS support_cnt, a.ic AS antecedent_cnt,
       round(CAST(pc AS DOUBLE) / a.ic, 6) AS confidence,
       round(CAST(pc * nb.nb AS DOUBLE) / (a.ic * c.ic), 6) AS lift
FROM ru JOIN fi a ON a.i = ru.antecedent
        JOIN fi c ON c.i = ru.consequent, nb"""


CUSUM_K_E6 = 60_000_000
CUSUM_H_E6 = 200_000_000


def q_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift audit per user (operators/timeseries.py):
    the max(0, S+x-k) recursion rewritten as running-sum minus running-
    min — two stacked windows, exact int64 micro-units, no recursion."""
    from unarxive_spark.operators.timeseries import cusum_drift

    return cusum_drift(
        _t(spark, sf_dir, "events"),
        k_e6=CUSUM_K_E6,
        h_e6=CUSUM_H_E6,
    )


SQL_CUSUM_DRIFT = f"""
WITH s AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn,
         sum(CAST(round(value * 1e6) AS BIGINT) - {CUSUM_K_E6})
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
),
t AS (
  SELECT user_id, rn,
         CAST(cum - least(CAST(0 AS BIGINT),
                          min(cum) OVER (PARTITION BY user_id ORDER BY rn
                                         ROWS UNBOUNDED PRECEDING))
              AS BIGINT) AS s
  FROM s
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       max(s) AS max_cusum_e6,
       CAST(sum(CASE WHEN s > {CUSUM_H_E6} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_drift_events,
       CAST(min(CASE WHEN s > {CUSUM_H_E6} THEN rn END) AS BIGINT)
         AS first_drift_rn
FROM t GROUP BY 1"""


EWMA_WINDOW = 16
EWMA_T_E6 = 150_000_000


def q_ewma_anomaly(spark, sf_dir):
    """Windowed alpha=1/2 EWMA smoothing + deviation anomalies per user
    (operators/timeseries.py): power-of-two weights make numerator /
    denominator exact int64; the anomaly predicate is an integer
    cross-multiplication — bit-stable across engines. The oracle
    reproduces the window as a bounded self-join (oracle-side only;
    the engine is one collect_list window + one HOF fold)."""
    from unarxive_spark.operators.timeseries import ewma_smooth

    return ewma_smooth(
        _t(spark, sf_dir, "events"),
        window=EWMA_WINDOW,
        anomaly_t_e6=EWMA_T_E6,
    )


SQL_EWMA_ANOMALY = f"""
WITH s AS (
  SELECT user_id, event_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS rn,
         CAST(round(value * 1e6) AS BIGINT) AS x
  FROM events
),
w AS (
  SELECT a.user_id, a.event_id, a.rn, a.x AS x_e6,
         sum(b.x * (CASE WHEN b.rn = greatest(1, a.rn - {EWMA_WINDOW - 1})
                         THEN 1
                         ELSE (CAST(1 AS BIGINT) <<
                               CAST(b.rn - greatest(1, a.rn - {EWMA_WINDOW - 1}) - 1 AS INT))
                    END)) AS ewma_num_h,
         (CAST(1 AS BIGINT) <<
          CAST(a.rn - greatest(1, a.rn - {EWMA_WINDOW - 1}) AS INT))
           AS ewma_den
  FROM s a JOIN s b
    ON b.user_id = a.user_id
   AND b.rn BETWEEN a.rn - {EWMA_WINDOW - 1} AND a.rn
  GROUP BY 1, 2, 3, 4
),
wb AS (
  SELECT user_id, event_id, rn, x_e6,
         CAST(ewma_num_h AS BIGINT) AS ewma_num, ewma_den
  FROM w
)
SELECT user_id, event_id, rn, x_e6, ewma_num, ewma_den,
       CAST((2 * ewma_num + ewma_den) // (2 * ewma_den) AS BIGINT)
         AS ewma_e6,
       coalesce(abs(x_e6 * lag(ewma_den) OVER uw - lag(ewma_num) OVER uw)
                > {EWMA_T_E6} * lag(ewma_den) OVER uw, FALSE) AS is_anomaly
FROM wb
WINDOW uw AS (PARTITION BY user_id ORDER BY rn)"""


TR_ITERS = 10
TR_TOPK = 20


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph (adjacent-token pairs, symmetric
    integer counts) — the flagship superstep machinery re-applied to a
    text-derived graph. Fixed TR_ITERS supersteps, scores rounded to
    1e-6, top-TR_TOPK by (rounded rank DESC, word ASC)."""
    from unarxive_spark.operators.pagerank import pagerank

    d = _t(spark, sf_dir, "documents")
    # few-MB single-split input: widen so the bigram explode's map side
    # doesn't run on one core (guide §2.5; no-op when the scan is wide)
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    grams = d.select(toks.alias("_toks")).filter(
        F.size("_toks") >= 2
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 1), "
                "i -> struct(_toks[i - 1] AS w1, _toks[i] AS w2))"
            )
        ).alias("g")
    ).select("g.w1", "g.w2").filter(F.col("w1") != F.col("w2"))
    edges = (
        grams.select(F.col("w1").alias("u"), F.col("w2").alias("v"))
        .unionByName(
            grams.select(F.col("w2").alias("u"), F.col("w1").alias("v"))
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
        .select(
            F.col("u").alias("src_conv_id"),
            F.col("v").alias("dst_conv_id"),
            "weight",
        )
    )
    res = pagerank(edges, damping=0.85, tol=-1.0, max_iter=TR_ITERS)
    return (
        res.ranks.select(
            F.col("conv_id").alias("word"),
            F.round("rank", 6).alias("rank"),
        )
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(TR_TOPK)
    )


def _sql_textrank() -> str:
    tok = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH dt AS (SELECT {tok} AS toks FROM documents),
tg AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM dt, LATERAL unnest(generate_series(1, len(toks) - 1)) AS s(i)
  WHERE len(toks) >= 2 AND toks[i] != toks[i + 1]
),
te AS MATERIALIZED (
  SELECT u, v, CAST(count(*) AS DOUBLE) AS weight FROM (
    SELECT w1 AS u, w2 AS v FROM tg
    UNION ALL
    SELECT w2, w1 FROM tg
  ) GROUP BY 1, 2
),
tverts AS (SELECT u AS w FROM te UNION SELECT v FROM te),
tn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tverts),
tout AS (SELECT u, SUM(weight) AS ow FROM te GROUP BY 1),
tnorm AS (SELECT te.u AS src, te.v AS dst, weight / ow AS p
          FROM te JOIN tout ON te.u = tout.u),
tdang AS (SELECT w FROM tverts
          WHERE w NOT IN (SELECT u FROM te)),
taug AS (
  SELECT src, dst, p FROM tnorm
  UNION ALL
  SELECT d.w, v.w, 1e0 / (SELECT n FROM tn)
  FROM tdang d CROSS JOIN tverts v
  UNION ALL
  SELECT w, w, 0e0 FROM tverts
),
tpr AS (
  WITH RECURSIVE prr(iter, w, rank) AS (
    SELECT 0, w, 1e0 / (SELECT n FROM tn) FROM tverts
    UNION ALL
    SELECT iter + 1, a.dst,
           0.15e0 / (SELECT n FROM tn) + 0.85e0 * SUM(a.p * prr.rank)
    FROM prr JOIN taug a ON a.src = prr.w
    WHERE iter < {TR_ITERS}
    GROUP BY 1, 2
  ) SELECT * FROM prr
)
SELECT w AS word, round(rank, 6) AS rank FROM tpr
WHERE iter = {TR_ITERS}
ORDER BY round(rank, 6) DESC, word ASC LIMIT {TR_TOPK}"""


SQL_TEXTRANK = _sql_textrank()


WJ_T_E6 = 200_000


def q_weighted_jaccard(spark, sf_dir):
    """Weighted (multiset) Jaccard near-dup pairs (operators/dedup.py):
    Σmin/Σmax over word 3-shingle frequencies — the repetition-aware
    refinement of q33's set Jaccard. Exact integer threshold + length
    filter via cross-multiplication; the single float op is the final
    rounded division."""
    from unarxive_spark.operators.dedup import weighted_jaccard_pairs

    return weighted_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold_e6=WJ_T_E6
    )


def _shingles_multi_sql(expr: str) -> str:
    toks = (
        f"list_filter(string_split_regex(trim(lower({expr})), '\\s+'),"
        " t -> t != '')"
    )
    return (
        f"CASE WHEN len({toks}) < 3 THEN [array_to_string({toks}, ' ')] "
        f"ELSE [array_to_string({toks}[i:i+2], ' ') "
        f"FOR i IN range(1, len({toks}) - 1)] END"
    )


SQL_WEIGHTED_JACCARD = f"""
WITH wsh AS (
  SELECT doc_id AS id, s AS shingle, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_shingles_multi_sql("text")}) AS s
        FROM documents)
  GROUP BY 1, 2
),
wtot AS (SELECT id, CAST(sum(tf) AS BIGINT) AS tot FROM wsh GROUP BY 1),
wl AS MATERIALIZED (
  SELECT wsh.id, shingle, tf, tot FROM wsh JOIN wtot USING (id)
),
wp AS (
  SELECT l.id AS id_a, r.id AS id_b, l.tot AS tot_a, r.tot AS tot_b,
         CAST(sum(least(l.tf, r.tf)) AS BIGINT) AS w_shared
  FROM wl l JOIN wl r
    ON l.shingle = r.shingle AND l.id < r.id
   AND 1000000 * l.tot >= {WJ_T_E6} * r.tot
   AND 1000000 * r.tot >= {WJ_T_E6} * l.tot
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, w_shared,
       tot_a + tot_b - w_shared AS w_union,
       round(CAST(w_shared AS DOUBLE) / (tot_a + tot_b - w_shared), 6)
         AS wjaccard
FROM wp
WHERE 1000000 * w_shared >= {WJ_T_E6} * (tot_a + tot_b - w_shared)"""


ENT_MIN_E6 = 1_200_000


def q_entropy_screen(spark, sf_dir):
    """Unigram-entropy + TTR quality screen (operators/quality.py):
    information-density complement of the Gopher repetition rules.
    ln frozen to int64 weights on the bounded (tf, n) domain, numerator
    exact, flag via integer cross-multiplication."""
    from unarxive_spark.operators.quality import entropy_screen

    return entropy_screen(
        _t(spark, sf_dir, "documents"), min_entropy_e6=ENT_MIN_E6
    )


def _sql_entropy_screen() -> str:
    from unarxive_spark.operators.quality import entropy_screen_sql

    return entropy_screen_sql(ENT_MIN_E6)


SQL_ENTROPY_SCREEN = _sql_entropy_screen()


TABULAR_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q20_pricing_summary": q_pricing_summary,
    "q21_revenue_by_nation": q_revenue_by_nation,
    "q22_top_orders_per_customer": q_top_orders_per_customer,
    "q23_customers_without_open_orders": q_customers_without_open_orders,
    "q24_richest_supplier_per_nation": q_richest_supplier_per_nation,
    "q25_sessionize_events": q_sessionize_events,
    "q26_hourly_event_counts": q_hourly_event_counts,
    "q27_text_features": q_text_features,
    "q28_lang_quality_histogram": q_lang_quality_histogram,
    "q29_fingerprints": q_fingerprints,
    "q30_exact_dup_stats": q_exact_dup_stats,
    "q31_minhash": q_minhash,
    "q32_simhash": q_simhash,
    "q33_jaccard_pairs": q_jaccard_pairs,
    "q34_cosine_topk": q_cosine_topk,
    "q35_match_cascade": q_match_cascade,
    "q36_license_histogram": q_license_histogram,
    "q40_doi_resolution": q_doi_resolution,
    "q45_order_priority_check": q_order_priority_check,
    "q47_moving_avg_value": q_moving_avg_value,
    "q48_repeat_buyers": q_repeat_buyers,
    "q53_lsh_ann": q_lsh_ann,
    "q54_ivf_ann": q_ivf_ann,
    "q55_asof_join": q_asof_join,
    "q56_range_join": q_range_join,
    "q70_qdigest_state": q_qdigest_state,
    "q76_priority_sample": q_priority_sample,
    "q88_weighted_priority_sample": q_weighted_priority_sample,
    "q89_edit_distance_pairs": q_edit_distance_pairs,
    "q91_chunk_documents": q_chunk_documents,
    "q92_pack_sequences": q_pack_sequences,
    "q93_decontaminate": q_decontaminate,
    "q94_bm25": q_bm25,
    "q95_bigram_pmi": q_bigram_pmi,
    "q96_tfidf_pairs": q_tfidf_pairs,
    "q97_duplicate_spans": q_duplicate_spans,
    "q98_nn_descent": q_nn_descent,
    "q99_bpe_merges": q_bpe_merges,
    "q100_unigram_lm": q_unigram_lm,
    "q102_mixture_sample": q_mixture_sample,
    "q103_snapshot_diff": q_snapshot_diff,
    "q104_markov_transitions": q_markov_transitions,
    "q105_repeated_spans": q_repeated_spans,
    "q106_dup_span_stats": q_dup_span_stats,
    "q108_kneser_ney": q_kneser_ney,
    "q110_sorted_neighborhood": q_sorted_neighborhood,
    "q111_daily_concurrency": q_daily_concurrency,
    "q112_state_history": q_state_history,
    "q113_skipgram_pmi": q_skipgram_pmi,
    "q115_dsir_scores": q_dsir_scores,
    "q116_hll_distinct": q_hll_distinct,
    "q117_quality_funnel": q_quality_funnel,
    "q119_phrase_search": q_phrase_search,
    "q121_association_rules": q_association_rules,
    "q122_cusum_drift": q_cusum_drift,
    "q124_ewma_anomaly": q_ewma_anomaly,
    "q128_textrank_keywords": q_textrank_keywords,
    "q131_weighted_jaccard": q_weighted_jaccard,
    "q132_entropy_screen": q_entropy_screen,
    "q77_vocab_topk": q_vocab_topk,
    "q78_containment_pairs": q_containment_pairs,
    "q80_funnel": q_funnel,
    "q81_cohorts": q_cohorts,
    "q82_qdigest_merge": q_qdigest_merge,
    "q83_outlier_trim": q_outlier_trim,
    "q57_repetition": q_repetition,
    "q58_pii_scrub": q_pii_scrub,
    "q59_distinct_sketch": q_distinct_sketch,
    "q60_stratified_split": q_stratified_split,
    "q64_value_quantiles": q_value_quantiles,
    "q66_asof_chunked": q_asof_join_chunked,
    "q67_cm_sketch": q_cm_sketch,
    "q68_bloom_semijoin": q_bloom_semijoin,
    "q71_qdigest_quantiles": q_qdigest_quantiles,
    "q75_dedup_clusters": q_dedup_clusters,
}

TABULAR_ORACLES: dict[str, str] = {
    "q20_pricing_summary": SQL_PRICING_SUMMARY,
    "q21_revenue_by_nation": SQL_REVENUE_BY_NATION,
    "q22_top_orders_per_customer": SQL_TOP_ORDERS_PER_CUSTOMER,
    "q23_customers_without_open_orders": SQL_CUSTOMERS_WITHOUT_OPEN_ORDERS,
    "q24_richest_supplier_per_nation": SQL_RICHEST_SUPPLIER_PER_NATION,
    "q25_sessionize_events": SQL_SESSIONIZE_EVENTS,
    "q26_hourly_event_counts": SQL_HOURLY_EVENT_COUNTS,
    "q27_text_features": SQL_TEXT_FEATURES,
    "q28_lang_quality_histogram": SQL_LANG_QUALITY_HISTOGRAM,
    "q29_fingerprints": SQL_FINGERPRINTS,
    "q30_exact_dup_stats": SQL_EXACT_DUP_STATS,
    "q31_minhash": SQL_MINHASH,
    "q32_simhash": SQL_SIMHASH,
    "q33_jaccard_pairs": SQL_JACCARD_PAIRS,
    "q34_cosine_topk": SQL_COSINE_TOPK,
    "q35_match_cascade": SQL_MATCH_CASCADE,
    "q36_license_histogram": SQL_LICENSE_HISTOGRAM,
    "q40_doi_resolution": SQL_DOI_RESOLUTION,
    "q45_order_priority_check": SQL_ORDER_PRIORITY_CHECK,
    "q47_moving_avg_value": SQL_MOVING_AVG_VALUE,
    "q48_repeat_buyers": SQL_REPEAT_BUYERS,
    "q53_lsh_ann": SQL_LSH_ANN,
    "q54_ivf_ann": SQL_IVF_ANN,
    "q55_asof_join": SQL_ASOF_JOIN,
    "q56_range_join": SQL_RANGE_JOIN,
    "q70_qdigest_state": SQL_QDIGEST_STATE,
    "q76_priority_sample": SQL_PRIORITY_SAMPLE,
    "q88_weighted_priority_sample": SQL_WEIGHTED_PRIORITY_SAMPLE,
    "q89_edit_distance_pairs": SQL_EDIT_DISTANCE_PAIRS,
    "q91_chunk_documents": SQL_CHUNK_DOCUMENTS,
    "q92_pack_sequences": SQL_PACK_SEQUENCES,
    "q93_decontaminate": SQL_DECONTAMINATE,
    "q94_bm25": SQL_BM25,
    "q95_bigram_pmi": SQL_BIGRAM_PMI,
    "q96_tfidf_pairs": SQL_TFIDF_PAIRS,
    "q97_duplicate_spans": SQL_DUPLICATE_SPANS,
    "q98_nn_descent": SQL_NN_DESCENT,
    "q99_bpe_merges": SQL_BPE_MERGES,
    "q100_unigram_lm": SQL_UNIGRAM_LM,
    "q102_mixture_sample": SQL_MIXTURE_SAMPLE,
    "q103_snapshot_diff": SQL_SNAPSHOT_DIFF,
    "q104_markov_transitions": SQL_MARKOV_TRANSITIONS,
    "q105_repeated_spans": SQL_REPEATED_SPANS,
    "q106_dup_span_stats": SQL_DUP_SPAN_STATS,
    "q108_kneser_ney": SQL_KNESER_NEY,
    "q110_sorted_neighborhood": SQL_SORTED_NEIGHBORHOOD,
    "q111_daily_concurrency": SQL_DAILY_CONCURRENCY,
    "q112_state_history": SQL_STATE_HISTORY,
    "q113_skipgram_pmi": SQL_SKIPGRAM_PMI,
    "q115_dsir_scores": SQL_DSIR_SCORES,
    "q116_hll_distinct": SQL_HLL_DISTINCT,
    "q117_quality_funnel": SQL_QUALITY_FUNNEL,
    "q119_phrase_search": SQL_PHRASE_SEARCH,
    "q121_association_rules": SQL_ASSOCIATION_RULES,
    "q122_cusum_drift": SQL_CUSUM_DRIFT,
    "q124_ewma_anomaly": SQL_EWMA_ANOMALY,
    "q128_textrank_keywords": SQL_TEXTRANK,
    "q131_weighted_jaccard": SQL_WEIGHTED_JACCARD,
    "q132_entropy_screen": SQL_ENTROPY_SCREEN,
    "q77_vocab_topk": SQL_VOCAB_TOPK,
    "q78_containment_pairs": SQL_CONTAINMENT_PAIRS,
    "q80_funnel": SQL_FUNNEL,
    "q81_cohorts": SQL_COHORTS,
    "q82_qdigest_merge": SQL_QDIGEST_MERGE,
    "q83_outlier_trim": SQL_OUTLIER_TRIM,
    "q57_repetition": SQL_REPETITION,
    "q58_pii_scrub": SQL_PII_SCRUB,
    "q59_distinct_sketch": SQL_DISTINCT_SKETCH,
    "q60_stratified_split": SQL_STRATIFIED_SPLIT,
    "q64_value_quantiles": SQL_VALUE_QUANTILES,
    "q66_asof_chunked": SQL_ASOF_JOIN,
    "q67_cm_sketch": SQL_CM_SKETCH,
    "q68_bloom_semijoin": SQL_BLOOM_SEMIJOIN,
    "q71_qdigest_quantiles": SQL_QDIGEST_QUANTILES,
    "q75_dedup_clusters": SQL_DEDUP_CLUSTERS,
}
