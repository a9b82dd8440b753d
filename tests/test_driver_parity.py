"""Oracle parity harness — mimics the driver: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # absorb last-ulp engine differences the way a sane hasher would
        return f"{val:.9g}"
    return str(val)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


def _all_pairs():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize(
    "name,fn,sql", _all_pairs(), ids=[n for n, _, _ in _all_pairs()]
)
def test_query_matches_oracle(spark, con, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        # rows-only contract: must run and be non-degenerate
        assert spark_rows is not None
        return
    rel = con.sql(sql)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        name,
        spark_cols,
        duck_cols,
    )
    # type parity: a schema-hash-style compare must not trip on dtypes
    duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
    type_map = {
        "bigint": "BIGINT",
        "int": "INTEGER",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "VARCHAR",
        "timestamp": "TIMESTAMP",
        "boolean": "BOOLEAN",
    }
    for f in sdf.schema.fields:
        expect = type_map.get(f.dataType.simpleString())
        if expect is not None:
            assert duck_types[f.name] == expect, (
                name,
                f.name,
                f.dataType.simpleString(),
                duck_types[f.name],
            )
    assert len(spark_rows) == len(duck_rows), (
        name,
        len(spark_rows),
        len(duck_rows),
    )
    got = _rows_to_multiset(spark_cols, spark_rows)
    want = _rows_to_multiset(duck_cols, duck_rows)
    if got != want:
        diff = [
            (g, w) for g, w in zip(got, want) if g != w
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
