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

    Returns the collected update stream (one row per (repo, batch-with-
    changes)): the LAST row per repo carries the final running totals.
    Bounded run via Trigger.AvailableNow; the sink is foreachBatch ->
    parquet append (NOT the memory sink — foreachBatch supports checkpoint
    RECOVERY, so re-invoking with the same checkpoint_dir resumes the state
    store and processes only new WAL files; memory sinks cannot recover).
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

    q = (
        stream.writeStream.foreachBatch(_append)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        q.awaitTermination()
        raise TimeoutError(f"repo_progress_stream did not drain in {timeout_sec}s")
    return spark.read.parquet(output_dir)


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "windowed_counts",
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
    bounded with AvailableNow; returns the finalized windows collected in
    the memory sink (open windows at end-of-input are intentionally absent
    — the append contract).
    """
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
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        q.awaitTermination()
        raise TimeoutError(
            f"windowed_event_counts_stream did not drain in {timeout_sec}s"
        )
    return spark.table(query_name)
