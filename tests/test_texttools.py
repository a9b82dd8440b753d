"""Text-analysis functions + DuckDB parity of their SQL renderings."""

import duckdb
import pytest
from pyspark.sql import functions as F

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
    shingles,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("  ",), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [3, 0, 0, 1]


def test_bpe_ish(spark):
    df = spark.createDataFrame([("hello, world 42!",)], "text string")
    # hello , world 4 2 ! → 6 chunks
    assert df.select(bpe_ish_token_count("text")).collect()[0][0] == 6


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und die katze ist da",),
            ("xyzzy plugh",),
            ("的 是 了",),
        ],
        "text string",
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "de", "und", "zh"]


def test_quality_score_bounds(spark):
    df = spark.read.parquet(DOCS)
    q = df.select(quality_score("text").alias("q"))
    bad = q.filter((F.col("q") < 0) | (F.col("q") > 1)).count()
    assert bad == 0


@pytest.mark.parametrize(
    "spark_fn,sql_fn,outtype",
    [
        (token_count, token_count_sql, "int"),
        (quality_score, quality_score_sql, "double"),
        (lang_id, lang_id_sql, "string"),
        (fingerprint, fingerprint_sql, "long"),
    ],
)
def test_duckdb_parity(spark, spark_fn, sql_fn, outtype):
    """Spark rendering and DuckDB rendering agree row-by-row on the real
    documents table — the same parity the driver's oracle harness checks."""
    sdf = (
        spark.read.parquet(DOCS)
        .select("doc_id", spark_fn("text").alias("v"))
        .orderBy("doc_id")
    )
    got = [(r["doc_id"], r["v"]) for r in sdf.collect()]
    want = duckdb.sql(
        f"SELECT doc_id, {sql_fn('text')} AS v FROM '{DOCS}' ORDER BY doc_id"
    ).fetchall()
    assert len(got) == len(want)
    for (gid, gv), (wid, wv) in zip(got, want):
        assert gid == wid
        if outtype == "double":
            assert abs(gv - wv) < 1e-12, (gid, gv, wv)
        else:
            assert gv == wv, (gid, gv, wv)


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(shingles("text", 3)).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]
