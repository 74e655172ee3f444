"""SparkSession factory tuned for the tiling/join workload.

Local-mode settings mirror what we would set on a real cluster:
AQE on (runtime coalesce + skew-join splitting), Arrow on (every pixel
kernel is a pandas UDF), shuffle partitions sized to cores not 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "veranda_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism of the master if local[N], else 2x cores
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(int(master[6:-1]), 4)
        else:
            shuffle_partitions = 2 * cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1024, not 4096: rows carry multi-KB image payloads, so 4096-row
        # Arrow batches are ~64 MB byte[]s; with 32 concurrent tasks that
        # put 10-20s of ParallelGC pauses on the critical path (measured:
        # 600k-row burn-in at local[32] went 24-73s -> 7-18s with 1024).
        # maxBytesPerBatch caps the Python->JVM return direction the same
        # way (worker-side, pyspark worker.py).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(32 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("VERANDA_SPARK_DRIVER_MEM", "24g"))
        # Arrow batches allocate multi-MB byte[]s; under G1 those are
        # "humongous" allocations and the default collector GC-thrashes
        # (measured 30x slowdown: VM Thread + GC threads saturating all
        # cores).  ParallelGC handles big short-lived arrays in eden.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC " + os.environ.get("VERANDA_SPARK_DRIVER_JAVA_OPTS", ""),
        )
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (needed between local[8]/local[32] bench runs)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # clear the JVM-held default session so a new master takes effect
    SparkSession.builder._options = {}
