"""SparkSession builder.

Single-JVM local mode for tests/bench, but every config here is chosen
for cluster-scale behavior: AQE (runtime partition coalescing + skew-join
splitting), explicit shuffle partition count sized to cores, UTC session
timezone (all timestamp semantics in the engine are timezone-proof — see
catalog conventions), and Arrow for any Python boundary crossing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tcga-query-project-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``spark.sql.shuffle.partitions`` defaults to the core count: at test
    scale anything larger just adds scheduling overhead, and at cluster
    scale AQE coalesces post-shuffle partitions anyway.

    ``extra_conf``: per-tool overrides applied last (e.g. bench_stress
    enables the UI to scrape stage spill metrics).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # the engine's catalog spans ~50 distinct plans, each with several
        # codegen units; the default 100-entry generated-class cache
        # thrashes across them (measured 3-12 s re-compile per evicted
        # plan at sf0.1 — compilation, not execution, dominated the
        # bench until the cache was sized to the workload).
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
