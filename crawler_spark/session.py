"""SparkSession construction tuned for the crawl workload.

Local-mode defaults here mirror what the spark-submit deployment would set
cluster-side (AQE, Arrow, modest shuffle partition counts). At 10^10-URL
scale the same builder is used with a real master URL and the partition
counts raised via ``shuffle_partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(cpus)))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative driver loop: broadcast/checkpoint blocks are only
        # reclaimed after a JVM GC lets ContextCleaner see dead refs —
        # tighten the periodic GC so long crawls don't accumulate heap.
        .config("spark.cleaner.periodicGC.interval", "30s")
        # Constraint propagation is exponential on the crawl loop's
        # union-of-joins state plans (millions of live EqualNullSafe/Or
        # nodes by step ~10, OOM + 10x step slowdown — measured); the
        # loop's filters are all explicit, so inference buys nothing.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # The listener-bus plan strings (SparkListenerSQLExecutionStart)
        # are rendered even with the UI off; composite iterative plans
        # (the in-loop dedup fold references its layered view ~6 times)
        # can render to GBs and OOM the driver — cap them. 8 MB keeps
        # real explain() output useful.
        .config("spark.sql.maxPlanStringLength", str(8 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffled-hash over sort-merge: the frontier/seen joins key on
        # high-cardinality urls where SMJ's two 10^7-row sorts dominate
        # (measured 24M⟕̸48M anti-join: SHJ 4.2s vs SMJ 12.4s at 32 cores,
        # scaling 0.59 vs 0.27). AQE still falls back to SMJ when a build
        # side is genuinely too big for local hash maps.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
