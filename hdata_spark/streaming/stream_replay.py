"""Structured Streaming replay: WAL/binlog tail via readStream + foreachBatch.

The reference's Kafka reader is its streaming archetype — an offset-tracked
topic tail, bounded per run by `max.fetch.size` / `max.wait.second`
(hdata-kafka/.../reader/kafka/KafkaConsumer.java:84-141;
`start.offset` seek :85-97). This module is the Spark-native generalization:

- the event log directory is the "topic" (`spark.readStream.parquet`);
  swapping in `format("kafka")` + `startingOffsets` changes NOTHING
  downstream — foreachBatch sees the same change-event frame;
- checkpointed source offsets replace the consumer group: a restarted query
  resumes from the last committed trigger (the reference re-reads from its
  static `start.offset`);
- `maxFilesPerTrigger` is the `max.fetch.size` bound (micro-batch sizing /
  backpressure); `Trigger.AvailableNow` is the bounded-replay mode — drain
  everything, checkpointing per batch, then stop;
- the apply stage inside foreachBatch is the SAME pipeline as batch replay:
  vectorized transforms -> registry projection -> LWW dedup -> stored-LSN
  sink commit, so stream and batch replays of one log converge to an
  identical final table (tested in tests/test_stream_replay.py);
- the sink commit honors ReplayConfig.sink_commit exactly like the batch
  path: "append" (default) stages each micro-batch's winners as bucketed
  delta files and commits metadata-only (merge-on-read fast-append, with
  delta-file-count-triggered compaction); "merge" takes the per-batch
  copy-on-write MERGE (read-optimized, commit-heavy).

Exactly-once: Spark re-delivers an in-flight micro-batch after a crash with
the SAME batch_id. The ledger (keyed by batch_id here — the stream's epoch)
skips fully-committed batches, and the stored-LSN LWW merge makes even a
raced re-apply a no-op — the same two-layer guarantee as batch replay.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdata_spark.operators.dedup import lww_latest
from hdata_spark.plans.schema_registry import SchemaRegistry
from hdata_spark.sinks.snapshot import (
    SnapshotTable,
    delta_footer_stats,
    list_bucket_files,
)
from hdata_spark.streaming.ledger import CommitLedger
from hdata_spark.streaming.metrics import MetricsLog
from hdata_spark.streaming.replay import (
    ReplayConfig,
    _evolve_table_forward,
    _prof,
    _transform,
)


def apply_change_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    table: SnapshotTable,
    ledger: CommitLedger,
    metrics: MetricsLog,
    registry: SchemaRegistry,
    cfg: ReplayConfig,
    maybe_schema_changes: bool = True,
) -> dict | None:
    """Apply ONE micro-batch of change events (shared stream/batch core).

    Schema-change events in the batch are applied first (in LSN order), then
    all data events project against the updated registry — within a single
    micro-batch this matches the batch replayer's isolate-the-schema-epoch
    rule because projection only ADDS evolved columns; data rows preceding
    the change simply carry nulls there, exactly as the registry's
    since_lsn records.

    `maybe_schema_changes=False` (set by `stream_replay` after profiling the
    log ONCE at stream start, the batch replayer's upfront-profile rule —
    replay.py `max_sc_epoch`) skips the per-trigger schema-change
    filter+collect job entirely: on a schema-stable WAL tail that job is a
    pure fixed cost paid every micro-batch for an always-empty result.
    """
    if ledger.is_committed(batch_id):
        return None
    t0 = time.time()
    applied = 0
    if maybe_schema_changes:
        changes = (
            batch.filter(F.col("op") == "schema_change")
            .select("lsn", "sc_kind", "sc_column", "sc_arg")
            .orderBy("lsn")
            .collect()
        )
        for ch in changes:
            if registry.has_lsn(ch["lsn"]):
                continue  # re-delivered batch: change already applied
            registry.apply_change(
                ch["sc_kind"], ch["sc_column"], ch["sc_arg"], ch["lsn"]
            )
            applied += 1
    # Same crash-window rule as batch replay (_apply_schema_changes): the
    # manifest is driven from registry-vs-table drift so a resume after
    # "registry persisted, table commit lost" still re-drives the schema.
    # The drift probe is a local manifest read — no Spark job either way.
    if applied or table.schema_spec() != registry.spec:
        _evolve_table_forward(table, registry)

    data = batch.filter(F.col("op") != "schema_change").drop(
        "sc_kind", "sc_column", "sc_arg"
    )
    winners = lww_latest(data, keys=tuple(table.keys), order_col="lsn")
    winners = _transform(winners, registry, cfg)
    winners = winners.withColumn("bucket", table._bucket_expr())

    if cfg.sink_commit == "append":
        # Merge-on-read fast-append (the production WAL-tail mode; reference
        # archetype hdata-kafka/.../reader/kafka/KafkaConsumer.java:84-141):
        # the batch's winners land ONCE as bucket-partitioned delta files
        # inside the table, then the commit is a metadata-only manifest
        # append (SnapshotTable.register_deltas) — no read or rewrite of
        # stored buckets per micro-batch. This removes the per-commit cost
        # that does NOT amortize under a high-frequency tail: with COW, every
        # trigger pays a full read+rewrite of its affected buckets, which
        # grows with table size; with MOR it pays only its own winners.
        # Readers resolve key versions by stored LSN; compaction (below)
        # folds deltas on a delta-file-count cadence.
        #
        # Crash safety: a crash after the stage write / register_deltas but
        # before the ledger commit re-delivers the batch (same batch_id),
        # which re-stages and re-registers IDENTICAL-content rows — the MOR
        # read's LWW window keeps exactly one copy per key, so the re-apply
        # is a no-op on final state (same two-layer guarantee as COW).
        logical = [c["name"] for c in registry.spec]
        staged_cols = winners.select(
            *logical,
            F.col("lsn").alias("_lsn"),
            F.when(F.col("op") == "delete", F.lit("d"))
            .otherwise(F.lit("u"))
            .alias("_op"),
            "bucket",
        )
        stage_rel = os.path.join(
            "data", f"delta_b{batch_id:08d}_{uuid.uuid4().hex[:8]}"
        )
        stage_dir = os.path.join(table.root, stage_rel)
        t0 = _prof(f"batch {batch_id} plan+schema", t0)
        (
            staged_cols.repartition(F.col("bucket"))
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(stage_dir)
        )
        t0 = _prof(f"batch {batch_id} stage write", t0)
        files_by_bucket = list_bucket_files(stage_dir, stage_rel)
        # Per-bucket stats come straight off the just-written files' parquet
        # FOOTERS (row counts + int64 max statistics) — the second per-trigger
        # Spark job this path used to launch (a re-read of its own output) is
        # gone; see sinks.snapshot.delta_footer_stats.
        stats = delta_footer_stats(table.root, files_by_bucket)
        t0 = _prof(f"batch {batch_id} footer stats", t0)
        merge_stats = table.register_deltas(files_by_bucket)
        t0 = _prof(f"batch {batch_id} register_deltas", t0)
    else:
        stats = (
            winners.groupBy("bucket")
            .agg(
                F.count("*").alias("applied_events"),
                F.max("lsn").alias("max_applied_lsn"),
            )
            .collect()
        )
        affected = sorted(int(r["bucket"]) for r in stats)
        merge_stats = table.merge(
            spark, winners.drop("bucket"), affected=affected, batch_deduped=True
        )
    if stats:
        gmax = max(int(r["max_applied_lsn"]) for r in stats)
        mean_rows = sum(int(r["applied_events"]) for r in stats) / len(stats)
    else:
        gmax, mean_rows = 0, 0.0
    partitions = [
        {
            "partition_id": int(r["bucket"]),
            "applied_events": int(r["applied_events"]),
            "lag_events": int(gmax - r["max_applied_lsn"]),
            "skew_ratio": (int(r["applied_events"]) / mean_rows) if mean_rows else 0.0,
            "salt_buckets": 1,
        }
        for r in sorted(stats, key=lambda r: r["bucket"])
    ]
    t0 = _prof(f"batch {batch_id} merge/stats tail", t0)
    metrics.append(batch_id, partitions)
    ledger.commit(
        batch_id,
        {
            "partitions": partitions,
            "committed_at_lsn": gmax,
            "applied_events": sum(p["applied_events"] for p in partitions),
            "schema_version": registry.versions[-1]["schema_version"],
            "snapshot_version": merge_stats["version"],
            "mode": "stream",
            "commit_kind": (
                "fast_append" if cfg.sink_commit == "append" else "merge"
            ),
        },
    )
    # Delta-file-count compaction cadence: fold MOR deltas once enough have
    # accumulated. Runs AFTER the ledger commit — compaction is read
    # optimization, never part of the batch's exactly-once window (a crash
    # mid-compact leaves the pre-compact snapshot fully committed, and
    # compact() itself commits atomically).
    t0 = _prof(f"batch {batch_id} metrics+ledger commit", t0)
    if (
        cfg.sink_commit == "append"
        and cfg.stream_compact_delta_files is not None
        and table.delta_file_count() > cfg.stream_compact_delta_files
    ):
        table.compact(spark)
        t0 = _prof(f"batch {batch_id} compact", t0)
    return merge_stats


def drain_available_now(
    writer, checkpoint_dir: str, timeout_sec: int, desc: str
):
    """Start a bounded (Trigger.AvailableNow) streaming write and block
    until it drains; on timeout, stop the query and RAISE instead of
    returning over a mid-flight sink. Shared by every bounded-drain
    operator (stream_replay, stateful progress, watermarked windows)."""
    q = (
        writer.option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        q.awaitTermination()
        raise TimeoutError(
            f"{desc} did not drain within {timeout_sec}s "
            f"(resume with the same checkpoint to continue)"
        )
    return q


def stream_replay(
    spark: SparkSession,
    events_dir: str,
    table: SnapshotTable,
    ledger: CommitLedger,
    metrics: MetricsLog,
    registry: SchemaRegistry,
    checkpoint_dir: str,
    cfg: ReplayConfig | None = None,
    max_files_per_trigger: int = 4,
    timeout_sec: int = 600,
    _post_profile_hook=None,
) -> dict:
    """Drain the event-log directory through Structured Streaming.

    Bounded replay (`Trigger.AvailableNow`): processes everything currently
    in `events_dir` in checkpointed micro-batches of `max_files_per_trigger`
    files, then stops. Re-invoking with the same checkpoint resumes after
    the last committed trigger — new files only (the WAL-tail loop).

    `_post_profile_hook` is test-only: invoked between the schema-change
    profile and the stream start, it deterministically reproduces a
    concurrent WAL writer landing a segment inside that window (the race
    the per-batch inputFiles() coverage check below exists for).
    """
    cfg = cfg or ReplayConfig()
    log = spark.read.parquet(events_dir)
    schema = log.schema

    # Upfront profile (ONE tiny job per drain, the batch replayer's
    # max_sc_epoch rule): does the log contain ANY schema-change event? If
    # not, every micro-batch skips its schema-change filter+collect job — a
    # fixed per-trigger cost on the (typical) schema-stable WAL tail.
    #
    # Soundness under a CONCURRENT WAL writer: the profile's batch read and
    # the streaming query's AvailableNow snapshot are two separate file
    # listings, so a segment landing between them would be drained without
    # having been profiled. We therefore record exactly WHICH files the
    # profile covered and, per micro-batch, escalate back to the full
    # schema-change scan if the batch contains any file the profile never
    # saw. The batch's exact file set comes from the checkpoint's
    # file-source log (`<ckpt>/sources/0/<batchId>`, written by the source
    # BEFORE foreachBatch runs) — a tiny driver-side JSON read, zero Spark
    # jobs (micro-batch frames expose no inputFiles()). A quiescent log
    # pays ~ms extra; a racing writer costs one filter job for the
    # unprofiled batch, never a silently skipped schema change. If the
    # source log can't be read (compacted/unexpected layout), escalate —
    # the safe direction.
    maybe_sc = (
        "op" in schema.fieldNames()
        and log.filter(F.col("op") == "schema_change").limit(1).count() > 0
    )

    def _norm_path(p: str) -> str:
        from urllib.parse import unquote

        p = unquote(p)
        return p.split("://", 1)[-1] if "://" in p else p.removeprefix("file:")

    profiled_files = frozenset(_norm_path(p) for p in log.inputFiles())

    def _batch_fully_profiled(batch_id: int) -> bool:
        import json as _json

        log_path = os.path.join(checkpoint_dir, "sources", "0", str(batch_id))
        try:
            with open(log_path) as f:
                for line in f:
                    line = line.strip()
                    if not line or not line.startswith("{"):
                        continue  # version header
                    path = _json.loads(line).get("path")
                    if path and _norm_path(path) not in profiled_files:
                        return False
            return True
        except OSError:
            return False

    if _post_profile_hook is not None:
        _post_profile_hook()

    n_batches = {"n": 0}
    last_end = {"t": None}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if last_end["t"] is not None:
            _prof(f"trigger gap before batch {batch_id}", last_end["t"])
        batch_maybe_sc = maybe_sc or not _batch_fully_profiled(int(batch_id))
        apply_change_batch(
            spark, batch_df, int(batch_id), table, ledger, metrics, registry,
            cfg, maybe_schema_changes=batch_maybe_sc,
        )
        n_batches["n"] += 1
        last_end["t"] = time.time()

    drain_available_now(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
        .writeStream.foreachBatch(_apply),
        checkpoint_dir,
        timeout_sec,
        "stream_replay",
    )
    return {
        "batches": n_batches["n"],
        "final_snapshot_version": table.current_version(),
    }
