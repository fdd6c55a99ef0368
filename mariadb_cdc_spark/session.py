"""SparkSession factory with scale-oriented defaults.

The reference engine is single-threaded (one reader thread per MariadbCdc,
/root/reference/src/main/java/mariadbcdc/shyikobinlog/DefaultBinaryLogWrapper.java:90-100).
This engine is built for multi-executor clusters; these configs are the
local-mode stand-in for a spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mariadb-cdc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the CDC pipeline.

    Scale notes (these matter at 100 TB, and are cheap locally):
      - AQE on: runtime partition coalescing + skew-join splitting so the
        merge-apply shuffle survives zipfian repo/table skew.
      - NO mapKeyDedupPolicy override: every map build/merge in the engine
        is duplicate-key-free by construction (operators.fold._merge_maps),
        so the engine runs under a stock SparkSession (default EXCEPTION
        policy) — tests/conftest.py deliberately uses defaults to prove it.
      - Arrow enabled: every Python-side kernel is a vectorized pandas UDF,
        never per-row Python.
      - UTC session TZ: deterministic vs the DuckDB oracle.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else str(os.cpu_count() or 8)
        shuffle_partitions = int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
