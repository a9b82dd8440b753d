"""SparkSession factory tuned for the link-graph workload.

Defaults target local[N] testing but every knob is chosen for
multi-executor scale (AQE, skew-join handling, Arrow batching):
the same builder config ships to `spark-submit` unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scale-oriented defaults. On a real cluster only master/memory change;
# these plan-shaping configs stay.
_BASE_CONF: dict[str, str] = {
    # AQE: runtime re-plan, partition coalescing, skew-join splitting.
    # Hub conversations (power-law in-degree) make the edges⋈ranks join
    # skewed; AQE splits oversized partitions on the sort-merge path.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDFs — the only Python touchpoint in the engine.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Nested-struct column pruning (refs array<struct> columns).
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    # Iterative loops re-use exchanges; keep shuffle compact.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Deterministic timestamps in tests regardless of host zone.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # keep metastore/warehouse artifacts out of the repo working dir
    "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
    "spark.driver.extraJavaOptions": (
        "-Djava.io.tmpdir=/tmp -Dderby.system.home=/tmp"
    ),
    # local mode runs executors inside the driver JVM: size it for the
    # bench-scale graphs (only applies at first JVM launch per process).
    "spark.driver.memory": "48g",
    "spark.driver.maxResultSize": "4g",
}


def get_spark(
    master: str | None = None,
    app_name: str = "unarxive-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count so test-scale
    shuffles don't fan out into thousands of empty tasks; on a real
    cluster pass ~2-3x total cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_BASE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    elif master.startswith("local["):
        n = master[len("local[") : -1]
        if n.isdigit():
            conf["spark.sql.shuffle.partitions"] = n
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session (needed between two-parallelism bench runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
