"""Batch memo read-through join with miss write-back (J3).

Reference analog: the OpenAlex matcher keeps a per-key memo of previous
resolution results; each batch left-joins against it, resolves only the
misses (the expensive external call), and appends the new results back
(/root/reference/src/match_references_openalex.py:471-508).

Spark-first shape: the memo is a parquet (→ Iceberg) table keyed by a
content hash. One anti-join finds the misses, the resolver runs ONCE on
the distinct miss keys, and the append is idempotent per key because
keys are content-derived (a re-run resolves nothing and appends
nothing). At 100 TB the memo join is a plain equi-join on the key —
broadcastable while the memo is small, shuffle-join later; either way
the external-resolution work is bounded by the NEW keys only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession


def _read_memo(
    spark: SparkSession, memo_path: str, memo_schema: str
) -> DataFrame:
    try:
        return spark.read.schema(memo_schema).parquet(memo_path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return spark.createDataFrame([], memo_schema)
        raise


def memo_resolve(
    requests: DataFrame,
    memo_path: str,
    resolver: Callable[[DataFrame], DataFrame],
    memo_schema: str,
    key_col: str = "key",
) -> DataFrame:
    """Resolve ``requests[key_col]`` through a persistent memo table.

    1. misses = distinct request keys anti-joined against the memo
    2. ``resolver(misses)`` → rows in ``memo_schema`` (key + values);
       called ONLY when misses exist — a second run over the same
       requests does zero external-resolution work (asserted in tests)
    3. resolved misses are appended to the memo (write-back)
    4. returns requests left-joined with the updated memo

    The returned frame reads the memo from disk, so concurrent callers
    see each other's appends at read time.
    """
    spark = requests.sparkSession
    memo = _read_memo(spark, memo_path, memo_schema)
    keys = requests.select(key_col).distinct()
    misses = keys.join(memo.select(key_col), key_col, "left_anti")
    if not misses.isEmpty():
        resolved = resolver(misses)
        if resolved.columns != spark.createDataFrame([], memo_schema).columns:
            raise ValueError(
                "resolver output columns must match memo_schema order: "
                f"{resolved.columns}"
            )
        resolved.write.mode("append").parquet(memo_path)
    # dedup on read: concurrent callers (or a crash between append and
    # commit) can land duplicate keys in the memo; keys are content-
    # derived so duplicate rows are identical — keep one per key so the
    # left join stays 1:1 with the requests
    return requests.join(
        _read_memo(spark, memo_path, memo_schema).dropDuplicates(
            [key_col]
        ),
        key_col,
        "left",
    )
