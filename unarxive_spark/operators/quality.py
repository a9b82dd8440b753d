"""Repetition / diversity quality metrics (Gopher-rule style).

Reference capability analog: the reference's ML-prep length predicate
(`/root/reference/src/utility_scripts/ml_tasks_prep_data.py:274-276`) is
the seed of a quality-filter stage; a 100-TB training-data pipeline
extends it with repetition screens (Rae et al. 2021 "Gopher" §A1.1:
fraction of text in the most common n-gram, duplicate-token ratios).

Per document:
- ``n_tokens``          whitespace token count
- ``ttr``               type-token ratio (distinct/total; 0 when empty)
- ``top_bigram_count``  occurrences of the most frequent word bigram
- ``top_bigram_frac``   that count / number of bigrams (0 when < 2 toks)

Spark-first plan: token/distinct counts are per-row JVM HOFs; the
dominant-bigram count uses explode → (doc, bigram) partial-agg groupBy →
per-doc max — linear in corpus size and fully distributed, instead of a
per-row O(distinct² ) nested-HOF mode search that would stall on long
documents.  The bigram explode shuffles on (doc_id, bigram), so hot
bigrams do NOT skew (the doc_id component spreads them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unarxive_spark.functions.texttools import tokens

__all__ = ["repetition_metrics", "repetition_metrics_sql"]


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    n1 = F.greatest(F.size("__toks") - F.lit(1), F.lit(0))
    bigrams = F.zip_with(
        F.slice("__toks", F.lit(1), n1),
        F.slice("__toks", F.lit(2), n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = docs.select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_distinct"),
        bigrams.alias("__bgs"),
    )
    top = (
        base.select(id_col, F.explode("__bgs").alias("__bg"))
        .groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .groupBy(id_col)
        .agg(F.max("__cnt").alias("top_bigram_count"))
    )
    out = base.drop("__bgs").join(top, on=id_col, how="left")
    n_bg = F.greatest(F.col("n_tokens") - F.lit(1), F.lit(1)).cast("double")
    return out.select(
        id_col,
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(F.col("n_distinct") / F.col("n_tokens"))
        .alias("ttr"),
        F.coalesce("top_bigram_count", F.lit(0)).cast("long").alias(
            "top_bigram_count"
        ),
        F.when(F.col("n_tokens") < 2, F.lit(0.0))
        .otherwise(F.coalesce("top_bigram_count", F.lit(0)) / n_bg)
        .alias("top_bigram_frac"),
    )


def repetition_metrics_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB rendering of :func:`repetition_metrics` (same token split,
    same bigram definition, same zero-guards)."""
    toks = (
        f"list_filter(string_split_regex(trim({text_col}), '\\s+'), "
        "x -> x != '')"
    )
    return f"""
WITH t AS (
  SELECT {id_col}, {toks} AS toks FROM {table}
), s AS (
  SELECT {id_col}, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         list_transform(range(1, greatest(len(toks), 1)),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bgs
  FROM t
), c AS (
  SELECT {id_col}, bg, count(*) AS cnt
  FROM (SELECT {id_col}, unnest(bgs) AS bg FROM s)
  GROUP BY 1, 2
), m AS (
  SELECT {id_col}, max(cnt) AS top_cnt FROM c GROUP BY 1
)
SELECT s.{id_col},
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN s.n_tokens = 0 THEN 0e0
            ELSE CAST(s.n_distinct AS DOUBLE) / s.n_tokens END AS ttr,
       CAST(coalesce(m.top_cnt, 0) AS BIGINT) AS top_bigram_count,
       CASE WHEN s.n_tokens < 2 THEN 0e0
            ELSE CAST(coalesce(m.top_cnt, 0) AS DOUBLE)
                 / (s.n_tokens - 1) END AS top_bigram_frac
FROM s LEFT JOIN m USING ({id_col})"""


def entropy_screen(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_entropy_e6: int = 1_200_000,
) -> DataFrame:
    """Unigram-entropy + type-token-ratio quality screen.

    Shannon entropy of the per-document unigram distribution,
    H = Σ (tf/n)·ln(n/tf) — the information-density complement of the
    Gopher repetition rules (templated/boilerplate docs score low even
    when no single n-gram dominates).

    Exactness discipline: the only float op is ``ln(n/tf)`` on a tiny
    integer-pair domain (both engines agree there, the q107 precedent);
    it is frozen to an int64 weight ``round(1e6·ln(n/tf))`` ONCE per
    (tf, n) pair, the numerator ``Σ tf·w`` is an exact int64 (order-
    independent), and the low-entropy flag is the exact integer
    cross-multiplication ``num < t_e6 · n``.  → ``(doc_id, n_tokens,
    n_types, entropy_num, entropy, ttr, is_low_entropy)``.

    100-TB shape: one explode → (doc, term) partial-agg groupBy → one
    per-doc agg; the (doc, term) key spreads hot terms.
    """
    t_e6 = int(min_entropy_e6)
    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tot = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n"), F.count(F.lit(1)).alias("n_types")
    )
    w = F.round(
        F.lit(1e6)
        * F.log(F.col("n").cast("double") / F.col("tf"))
    ).cast("long")
    return (
        tf.join(tot, "doc_id")
        .select("doc_id", "n", "n_types", (F.col("tf") * w).alias("c"))
        .groupBy("doc_id", "n", "n_types")
        .agg(F.sum("c").alias("entropy_num"))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            "n_types",
            "entropy_num",
            F.round(
                F.col("entropy_num").cast("double") / F.col("n") / 1e6, 6
            ).alias("entropy"),
            F.round(
                F.col("n_types").cast("double") / F.col("n"), 6
            ).alias("ttr"),
            (
                F.col("entropy_num") < F.lit(t_e6) * F.col("n")
            ).alias("is_low_entropy"),
        )
    )


def entropy_screen_sql(min_entropy_e6: int = 1_200_000) -> str:
    """DuckDB rendering of :func:`entropy_screen` over ``documents``."""
    toks = (
        "list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        "t -> t != '')"
    )
    return f"""
WITH etf AS (
  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
  GROUP BY 1, 2
),
etot AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_types
  FROM etf GROUP BY 1
),
eagg AS (
  SELECT etf.doc_id, n, n_types,
         CAST(sum(tf * CAST(round(1e6 * ln(CAST(n AS DOUBLE) / tf))
                            AS BIGINT)) AS BIGINT) AS entropy_num
  FROM etf JOIN etot ON etf.doc_id = etot.doc_id
  GROUP BY 1, 2, 3
)
SELECT doc_id, n AS n_tokens, n_types, entropy_num,
       round(CAST(entropy_num AS DOUBLE) / n / 1e6, 6) AS entropy,
       round(CAST(n_types AS DOUBLE) / n, 6) AS ttr,
       entropy_num < {int(min_entropy_e6)} * n AS is_low_entropy
FROM eagg"""
