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
        # size GC/JIT/compiler threads to the requested core count, not the
        # host's — otherwise a local[N] JVM on a 32-thread box behaves like
        # an N+k-core executor and cross-parallelism comparisons lie
        .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cpus}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    # shuffle/spill scratch: prefer tmpfs in this sandbox (the microVM's
    # virtio disk is ~340 MB/s and would serialize multi-core shuffles);
    # on a real cluster leave unset → executor-local NVMe
    local_dir = os.environ.get("FILIPO_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/filipo-spark-tmp"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
