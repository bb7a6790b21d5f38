"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app: str = "prclz-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sp = shuffle_partitions if shuffle_partitions is not None else int(cpus) if cpus.isdigit() else 32
    if master is None:
        # under spark-submit the cluster master arrives via spark.master in
        # the system properties — never clobber it with a local default
        from pyspark import SparkConf

        master = None if SparkConf().contains("spark.master") else f"local[{cpus}]"
    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder
        .appName(app)
        # AQE skew-join splitting on top of our explicit hot-cell salting
        # (SURVEY.md §4 item 2). Partition COALESCING is disabled: AQE sizes
        # partitions by shuffle BYTES, but our applyInPandas geometry kernels
        # cost ~10^4 more CPU per byte than relational operators, so byte-
        # based coalescing collapses kernel stages to one task (measured 5.6x
        # slowdown at local[32]); we size spark.sql.shuffle.partitions to the
        # core count explicitly instead.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(sp))
        # Arrow is the JVM↔Python boundary for every geometry/image kernel
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # local mode niceties
        .config("spark.locality.wait", "0s")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # caller overrides (e.g. bench re-enables the UI to read per-task
    # metrics off the status REST API); applied last so they win
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
