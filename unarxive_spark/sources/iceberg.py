"""Iceberg catalog wiring (deployment path).

The north rule targets Iceberg tables of transcripts. This sandbox ships
no Iceberg runtime jar, so the engine runs on parquet directories with
identical semantics (schema-on-write, overwrite-by-path checkpoints);
this module carries the exact session configuration and DDL a real
deployment uses, gated behind a runtime availability check.

Mapping (see also sources/checkpoint.py, sources/tables.py):
- transcripts / edges / ranks parquet dirs  → Iceberg tables
- ``write.mode("overwrite").parquet(p)``    → ``writeTo(t).createOrReplace()``
- checkpoint ``iter=N`` dirs                → per-iteration snapshots
  (resume = read snapshot-of-iteration from the lineage table)
- bucketed parquet (tables.py)              → ``bucket(N, src_conv_id)``
  partition transform
- incremental streaming landing zone        → Iceberg append + periodic
  rewrite_data_files compaction
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_CONF = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.graft": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.graft.type": "hadoop",
    # warehouse root; on a cluster this is an object-store URI
    "spark.sql.catalog.graft.warehouse": "/tmp/iceberg-warehouse",
}

TRANSCRIPTS_DDL = """
CREATE TABLE IF NOT EXISTS graft.db.transcripts (
  conv_id string, turn_idx int, role string,
  text string, tool string, ts timestamp
) USING iceberg
PARTITIONED BY (days(ts), bucket(64, conv_id))
"""

EDGES_DDL = """
CREATE TABLE IF NOT EXISTS graft.db.edges (
  src_conv_id string, dst_conv_id string, weight double
) USING iceberg
PARTITIONED BY (bucket(64, src_conv_id))
"""


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def ensure_tables(spark: SparkSession) -> bool:
    """Create the engine's tables when Iceberg is present; no-op (False)
    otherwise — callers fall back to the parquet layout."""
    if not iceberg_available(spark):
        return False
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql(TRANSCRIPTS_DDL)
    spark.sql(EDGES_DDL)
    return True
