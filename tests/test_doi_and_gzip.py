"""P14/P15 DOI extraction + derivation and the S2 gz-member decode."""

import gzip
import re

from pyspark.sql import functions as F

from unarxive_spark.functions.refs import extract_dois, implicit_doi
from unarxive_spark.multimodal.media import gunzip_payloads

DOI_PY = re.compile(r"\b(10[.][0-9]{4,9}/[-._;()/:A-Za-z0-9]+)")


def test_extract_dois_matches_python_regex(spark):
    texts = [
        "see doi:10.1234/j.abc.5678. and 10.5555/xyz-1_2;",
        "no identifiers here",
        "(10.1103/PhysRevX.13.011048)",
        "edge 10.99999/a.b.c,",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["d"] for r in df.select(extract_dois("text").alias("d")).collect()
    ]
    for t, ds in zip(texts, got):
        want = [re.sub(r"[.,;)]+$", "", m) for m in DOI_PY.findall(t or "")]
        assert ds == want, (t, ds, want)
    # punctuation trimmed, multiple hits kept in order
    assert got[0] == ["10.1234/j.abc.5678", "10.5555/xyz-1_2"]


def test_implicit_doi_heuristic(spark):
    df = spark.createDataFrame(
        [("src3", 17), ("journalx", 4)], "source string, doc_id int"
    )
    got = [
        r["d"]
        for r in df.select(
            implicit_doi("source", "doc_id").alias("d")
        ).collect()
    ]
    assert got == ["10.1103/src3.17", None]


def test_q40_doi_resolution_matches_duckdb(spark):
    import duckdb

    from unarxive_spark.plans.tabular_queries import (
        SQL_DOI_RESOLUTION,
        q_doi_resolution,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(tuple, q_doi_resolution(spark, sf).collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(SQL_DOI_RESOLUTION).fetchall()))
    assert got == want
    assert sum(r[2] for r in got) > 0 and sum(r[3] for r in got) > 0


def test_gunzip_payloads_roundtrip_and_bad_member(spark):
    rows = [
        ("m0", "c0", gzip.compress(b"hello latex source")),
        ("m1", "c1", gzip.compress(b"" * 0)),
        ("m2", "c2", b"not gzip at all"),  # unreadable member -> NULL
        ("m3", "c3", None),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, conv_id string, payload binary"
    )
    out = {
        r["media_id"]: (bytes(r["payload"]) if r["payload"] is not None else None)
        for r in gunzip_payloads(df).collect()
    }
    assert out["m0"] == b"hello latex source"
    assert out["m1"] == b""
    assert out["m2"] is None
    assert out["m3"] is None
    # composes with the charset-sniffing decode (S2 -> S3 pipeline)
    from unarxive_spark.functions.texttools import decode_text

    txt = (
        gunzip_payloads(df)
        .filter("media_id = 'm0'")
        .select(decode_text("payload").alias("t"))
        .collect()[0]["t"]
    )
    assert txt == "hello latex source"
