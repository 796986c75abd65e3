"""SparkSession factory with scale-oriented defaults.

The sandbox runs local[N] in a single JVM, but every setting here is chosen to
also be the right call on a 1000-executor cluster reading 100 TB:

- AQE on: runtime coalescing of small shuffle partitions + skew-join splitting.
- Arrow on: every pandas UDF exchange is columnar (no per-row pickling).
- shuffle.partitions sized to cores locally; on a real cluster this should be
  ~2-3x total executor cores (or left to AQE's coalescing with a high initial).
- maxPartitionBytes at the 128 MB default keeps scan tasks right-sized for
  100 TB inputs (~800k tasks, fine for a large cluster; AQE coalesces tails).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "hdata_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` controls local parallelism (local[cpus]); the bench harness uses
    this to evidence N->4N scaling (local[8] vs local[32]).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Local mode runs every task inside the driver JVM; size the heap for
        # cores x in-flight partitions of wide string data or GC dominates.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 32 MB scan splits: CDC replay does real per-row work (hashing,
        # normalization, wide-struct agg), so favor more, smaller scan tasks
        # than the 128 MB default; AQE coalesces any resulting small shuffles.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
