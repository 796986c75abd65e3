"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship CDC final-state query at sf0.001.
`queries()` exposes every implemented operator from SURVEY.md §2 (plus the
training-data ops); `oracle_sql()` gives the DuckDB-checkable twin for each.

The special entry `cdc_engine_replay` runs the ACTUAL engine end-to-end —
epoch replay loop -> LWW dedup -> bucketed snapshot MERGE -> ledger — over
the driver's `events` table mapped to change events, then reads the final
table state back. Its oracle is the plain LWW SQL, so the whole pipeline
(sink included) is value-checked against DuckDB.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdata_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def _cdc_engine_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine replay over `events` recast as a CDC log (rows + values
    oracle-checked: the LWW SQL below must equal the engine's final table)."""
    from hdata_spark.plans.schema_registry import SchemaRegistry
    from hdata_spark.sinks.snapshot import SnapshotTable
    from hdata_spark.streaming.ledger import CommitLedger
    from hdata_spark.streaming.metrics import MetricsLog
    from hdata_spark.streaming.replay import ReplayConfig, replay

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ~4 epochs at any scale factor (epoch size never changes final state,
    # only checkpoint granularity).
    epoch_size = max(
        (ev.agg(F.max("event_id")).collect()[0][0] or 0) // 4 + 1, 1
    )
    changes = ev.select(
        F.col("event_id").alias("lsn"),
        F.floor(F.col("event_id") / F.lit(epoch_size)).cast("long").alias("epoch"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.col("user_id").cast("string").alias("repo"),
        F.lit("state").alias("path"),
        F.col("event_id").cast("string").alias("commit"),
        F.lit("python").alias("lang"),
        F.col("props").alias("content"),
        F.lit(None).cast("string").alias("sc_kind"),
        F.lit(None).cast("string").alias("sc_column"),
        F.lit(None).cast("string").alias("sc_arg"),
    )
    d = tempfile.mkdtemp(prefix="hdata_spark_entry_")
    table = SnapshotTable(d + "/table", n_buckets=16)
    ledger = CommitLedger(d + "/ledger")
    metrics = MetricsLog(d + "/metrics")
    registry = SchemaRegistry(state_path=d + "/registry.json")
    replay(spark, changes, table, ledger, metrics, registry, ReplayConfig())
    final = table.read(spark)
    return final.select(
        F.col("repo").cast("bigint").alias("user_id"),
        F.col("commit").cast("bigint").alias("last_event_id"),
        F.col("content").alias("last_props"),
    )


def _cdc_engine_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same engine end-to-end through STRUCTURED STREAMING (readStream ->
    foreachBatch -> fast-append/MERGE), value-checked against the identical
    LWW oracle — stream and batch replays must converge to one table."""
    import os

    from hdata_spark.plans.schema_registry import SchemaRegistry
    from hdata_spark.sinks.snapshot import SnapshotTable
    from hdata_spark.streaming.ledger import CommitLedger
    from hdata_spark.streaming.metrics import MetricsLog
    from hdata_spark.streaming.stream_replay import stream_replay

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    changes = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.col("user_id").cast("string").alias("repo"),
        F.lit("state").alias("path"),
        F.col("event_id").cast("string").alias("commit"),
        F.lit("python").alias("lang"),
        F.col("props").alias("content"),
        F.lit(None).cast("string").alias("sc_kind"),
        F.lit(None).cast("string").alias("sc_column"),
        F.lit(None).cast("string").alias("sc_arg"),
    )
    d = tempfile.mkdtemp(prefix="hdata_spark_stream_entry_")
    events_dir = os.path.join(d, "wal")
    # 4 "WAL segments" -> >=4 checkpointed micro-batches
    changes.repartition(4).write.parquet(events_dir)
    table = SnapshotTable(d + "/table", n_buckets=16)
    stream_replay(
        spark,
        events_dir,
        table,
        CommitLedger(d + "/ledger"),
        MetricsLog(d + "/metrics"),
        SchemaRegistry(state_path=d + "/registry.json"),
        checkpoint_dir=d + "/ckpt",
        max_files_per_trigger=1,
    )
    final = table.read(spark)
    return final.select(
        F.col("repo").cast("bigint").alias("user_id"),
        F.col("commit").cast("bigint").alias("last_event_id"),
        F.col("content").alias("last_props"),
    )


def _cdc_engine_stateful_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM STATEFUL operator (applyInPandasWithState per-repo progress
    monitor — streaming/stateful.py) driven end to end and value-checked
    against its batch twin: after draining the WAL, the latest update row
    per repo (highest batch_id) must carry exactly the batch GROUP BY
    totals — streaming state accumulated across micro-batches converges to
    the batch aggregate."""
    import os

    from pyspark.sql import Window

    from hdata_spark.streaming.stateful import repo_progress_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    changes = ev.select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").cast("string").alias("repo"),
    )
    d = tempfile.mkdtemp(prefix="hdata_spark_stateful_entry_")
    events_dir = os.path.join(d, "wal")
    # 4 WAL segments -> 4 checkpointed micro-batches of state updates
    changes.repartition(4).write.parquet(events_dir)
    log = repo_progress_stream(
        spark, events_dir, os.path.join(d, "ckpt"), max_files_per_trigger=1
    )
    w = Window.partitionBy("repo").orderBy(F.col("batch_id").desc())
    latest = (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return latest.select(
        F.col("repo").cast("bigint").alias("user_id"),
        F.col("applied_events"),
        F.col("max_lsn"),
    )


_ENGINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_engine_replay": _cdc_engine_replay,
    "cdc_engine_stream_replay": _cdc_engine_stream_replay,
    "cdc_engine_stateful_progress": _cdc_engine_stateful_progress,
}

_LWW_FINAL_STATE_SQL = """
    SELECT user_id, event_id AS last_event_id, props AS last_props
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """

_ENGINE_ORACLES = {
    "cdc_engine_replay": _LWW_FINAL_STATE_SQL,
    "cdc_engine_stream_replay": _LWW_FINAL_STATE_SQL,
    # Batch twin of the stateful progress monitor: final per-repo state ==
    # plain GROUP BY over the whole event log.
    "cdc_engine_stateful_progress": """
    SELECT user_id, count(*) AS applied_events, max(event_id) AS max_lsn
    FROM events GROUP BY user_id
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Engine e2e entries lead the dict: they are the flagship (and slowest)
    checks, so an order-respecting runner exercises them first.
    """
    return {**_ENGINE_QUERIES, **QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names, same values)."""
    return {**ORACLES, **_ENGINE_ORACLES}
