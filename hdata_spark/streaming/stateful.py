"""Custom stateful + event-time streaming operators.

The reference is stateless (counters only — hdata-api/.../api/Metric.java:5-78)
and has no event-time notion; its offset tail is covered by
streaming/stream_replay.py. These two operators are the Spark-native
additions a CDC monitoring/analytics layer needs on top:

- ``repo_progress_stream`` — a CUSTOM STATEFUL operator via
  ``applyInPandasWithState``: per-repo (applied_events, max_lsn) state
  maintained across micro-batches, one update row emitted per repo per
  batch it changes in. This is the streaming twin of the replay loop's
  per-partition metrics — state lives in the state store (RocksDB/HDFS on
  a cluster), checkpointed with the query, so a restarted monitor resumes
  its counts exactly.
- ``windowed_event_counts_stream`` — event-time tumbling windows with a
  WATERMARK: late events beyond the lateness bound are dropped and only
  finalized windows are emitted (append mode) — the standard Structured
  Streaming late-data contract (the batch twin is queries.cdc_events_hourly).
  Note Spark's two-watermark micro-batch semantics (3.4+): late-event
  FILTERING uses the watermark as of the previous completed batch while
  state EVICTION uses the current one, so a row is only guaranteed dropped
  once a full batch has run after the watermark passed its window
  (tests/test_stateful_stream.py demonstrates the exact boundary).

Scale notes: both operators shuffle once on their grouping key (repo /
window start); state size is O(distinct repos) resp. O(open windows), both
bounded. The pandas state function is a by-value-pickled closure (workers
never import this package).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("applied_events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mx", T.LongType()),
    ]
)


def repo_progress_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    output_dir: str | None = None,
    max_files_per_trigger: int = 1,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain `events_dir` through a stateful per-repo progress monitor.

    Returns the update LOG read from `output_dir` (one row per (repo,
    batch-with-changes), stamped with batch_id): the row with the highest
    batch_id per repo carries the current running totals. Bounded run via
    Trigger.AvailableNow; the sink is foreachBatch -> parquet append (NOT
    the memory sink — foreachBatch supports checkpoint RECOVERY, so
    re-invoking with the same checkpoint_dir resumes the state store and
    processes only new WAL files; memory sinks cannot recover). With the
    default `output_dir` the log is CUMULATIVE across resumed runs (batch_id
    keeps increasing — it is the durable update stream); pass a fresh
    `output_dir` per invocation to see only that run's updates. A resume
    with no new WAL files returns an empty frame for a fresh output_dir.
    """
    output_dir = output_dir or checkpoint_dir + "_out"

    def update_progress(key, pdfs, state: GroupState):
        import pandas as _pd

        n, mx = (state.get if state.exists else (0, -1))
        for pdf in pdfs:
            n += len(pdf)
            batch_max = int(pdf["lsn"].max()) if len(pdf) else -1
            mx = max(mx, batch_max)
        state.update((int(n), int(mx)))
        yield _pd.DataFrame(
            {"repo": [key[0]], "applied_events": [int(n)], "max_lsn": [int(mx)]}
        )

    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
        .select("repo", "lsn")
        .groupBy("repo")
        .applyInPandasWithState(
            update_progress,
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    def _append(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(output_dir)

    from hdata_spark.streaming.stream_replay import drain_available_now

    drain_available_now(
        stream.writeStream.foreachBatch(_append).outputMode("update"),
        checkpoint_dir,
        timeout_sec,
        "repo_progress_stream",
    )
    if not os.path.isdir(output_dir):
        # zero batches ran (resume with no new WAL files): empty update log
        out_schema = T.StructType(
            PROGRESS_SCHEMA.fields + [T.StructField("batch_id", T.LongType())]
        )
        return spark.createDataFrame([], out_schema)
    return spark.read.parquet(output_dir)


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    output_dir: str | None = None,
    window_duration: str = "1 hour",
    lateness: str = "30 minutes",
    ts_col: str = "ts",
    max_files_per_trigger: int = 1,
    timeout_sec: int = 300,
) -> DataFrame:
    """Watermarked tumbling-window event counts over a streamed event log.

    Append mode: a window row is emitted exactly once, when the watermark
    (max event time - `lateness`) passes its end; events arriving later
    than the bound are DROPPED from their (already finalized) window. Runs
    bounded with AvailableNow into a parquet file sink (file sinks recover
    from the checkpoint, so re-invoking with the same checkpoint_dir tails
    new WAL files and appends only newly finalized windows; open windows at
    end-of-input are intentionally absent — the append contract). Returns
    the finalized windows accumulated in `output_dir`.
    """
    output_dir = output_dir or checkpoint_dir + "_out"
    schema = spark.read.parquet(events_dir).schema
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
        .withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )
    from hdata_spark.streaming.stream_replay import drain_available_now

    drain_available_now(
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir),
        checkpoint_dir,
        timeout_sec,
        "windowed_event_counts_stream",
    )
    return spark.read.parquet(output_dir)
