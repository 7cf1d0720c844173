"""SparkSession factory with engine defaults.

Defaults chosen for correctness-vs-DuckDB comparison (UTC timestamps,
Arrow enabled) and for scale (AQE + skew join on, shuffle partitions
sized to cores locally; on a real cluster leave shuffle partitions to
AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "filipo_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cores=None`` → ``local[*]``.  ``shuffle_partitions`` defaults to the
    core count in local mode — the right size for partition-fits-in-memory
    at sandbox scale; at 100 TB you would set it to ~2-3× total cluster
    cores and let AQE coalesce down.
    """
    cpus = cores or int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    sp = shuffle_partitions or cpus
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("FILIPO_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
