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
        # rows-only contract: must run, be non-degenerate, AND survive
        # the driver's pandas canonicalization — the real harness
        # sorts/hashes ALL columns even for rows-only rows, so an
        # unhashable output type (array<float>, bit q84 in r4) must
        # fail HERE before it ever reaches the driver.
        assert spark_rows is not None
        import pandas as pd

        pdf = pd.DataFrame(spark_rows, columns=spark_cols)
        if len(pdf):
            pdf = pdf.sort_values(by=sorted(spark_cols))
            pd.util.hash_pandas_object(pdf, index=False)
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


def test_cap_rotation_covers_ungated_queries():
    """The driver's CORRECTNESS artifact caps at 50 rows.  Invariants:
    every query with no green row in a past round's artifact must sit
    inside the first 50 registry slots, and the defer tail must stay
    long enough that newly added queries land inside the cap too."""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    qs = list(entry_mod.queries().keys())
    assert len(set(qs)) == len(qs)
    top50 = set(qs[:50])
    ever_green = set()
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            art = json.load(fh)
        ever_green |= {
            k
            for k, v in art.items()
            if v.get("rows_match") and v.get("hash_match")
        }
    ungated = [q for q in qs if q not in ever_green]
    outside = [q for q in ungated if q not in top50]
    assert not outside, (
        f"{len(outside)} queries have never had a green driver row and "
        f"sit outside the 50-row cap — extend _DEFER_LAST: {outside}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
