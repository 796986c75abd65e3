"""Structured Streaming replay: stream == oracle == batch, resume = no-op.

Covers the reference's streaming archetype (Kafka offset tail,
hdata-kafka/.../reader/kafka/KafkaConsumer.java:84-141) re-expressed as a
checkpointed file-stream: micro-batch drain, exactly-once under restart.
"""

from __future__ import annotations

import os

import pandas as pd

from hdata_spark.fixtures import oracle_final_state, sha256_fingerprint
from hdata_spark.plans.schema_registry import SchemaRegistry
from hdata_spark.sinks.snapshot import SnapshotTable
from hdata_spark.streaming.ledger import CommitLedger
from hdata_spark.streaming.metrics import MetricsLog
from hdata_spark.streaming.stream_replay import stream_replay

from tests.conftest import assert_state_equal


def _write_event_files(events: pd.DataFrame, d: str) -> str:
    """One parquet file per epoch — multiple stream triggers.

    Object columns are forced to string dtype: an epoch slice whose sc_*/
    payload column is all-None would otherwise get a different parquet
    physical type per file, and the stream's fixed schema read would fail.
    """
    os.makedirs(d, exist_ok=True)
    events = events.copy()
    for c in events.columns:
        if events[c].dtype == object:
            events[c] = events[c].astype("string")
    for epoch, part in events.groupby("epoch"):
        part.to_parquet(os.path.join(d, f"epoch_{int(epoch):04d}.parquet"), index=False)
    return d


def _mk(tmp_path, name):
    d = tmp_path / name
    d.mkdir(exist_ok=True)
    return (
        SnapshotTable(str(d / "table"), n_buckets=16),
        CommitLedger(str(d / "ledger")),
        MetricsLog(str(d / "metrics")),
        SchemaRegistry(state_path=str(d / "registry.json")),
        str(d / "checkpoint"),
    )


def test_stream_replay_matches_oracle(spark, tmp_path, small_fixture):
    base, events = small_fixture
    events_dir = _write_event_files(events, str(tmp_path / "events"))
    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "eng")
    table.overwrite(spark, spark.createDataFrame(base))
    stats = stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt,
        max_files_per_trigger=1,
    )
    assert stats["batches"] >= 2  # genuinely micro-batched
    assert_state_equal(table.read(spark).toPandas(), oracle_final_state(base, events))
    # per-batch ledger + metrics rows exist
    assert len(ledger.committed_epochs()) == stats["batches"]
    assert len(metrics.rows()) > 0


def test_stream_restart_resumes_without_reprocessing(spark, tmp_path, small_fixture):
    base, events = small_fixture
    events_dir = _write_event_files(events, str(tmp_path / "events"))
    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "eng")
    table.overwrite(spark, spark.createDataFrame(base))
    stream_replay(spark, events_dir, table, ledger, metrics, registry, ckpt)
    v1 = table.current_version()
    fp1 = sha256_fingerprint(table.read(spark).toPandas())
    # restart with the same checkpoint: nothing new -> no batches, no change
    stats2 = stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt
    )
    assert stats2["batches"] == 0
    assert table.current_version() == v1
    assert sha256_fingerprint(table.read(spark).toPandas()) == fp1


def test_stream_tail_new_files_only(spark, tmp_path, small_fixture):
    """The WAL-tail loop: files arriving after a drain are picked up alone."""
    base, events = small_fixture
    first = events[events["epoch"] < 2]
    rest = events[events["epoch"] >= 2]
    events_dir = str(tmp_path / "events")
    _write_event_files(first, events_dir)
    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "eng")
    table.overwrite(spark, spark.createDataFrame(base))
    stream_replay(spark, events_dir, table, ledger, metrics, registry, ckpt)
    mid_expected = oracle_final_state(base, first)
    assert_state_equal(table.read(spark).toPandas(), mid_expected)
    # "new WAL segments arrive"
    _write_event_files(rest, events_dir)
    stats2 = stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt,
        max_files_per_trigger=1,
    )
    assert stats2["batches"] >= 1
    assert_state_equal(table.read(spark).toPandas(), oracle_final_state(base, events))


def test_stream_fast_append_metadata_only_commits(spark, tmp_path, small_fixture):
    """sink_commit='append' (the default, honored since round 3): every
    micro-batch commit is a metadata-only manifest APPEND — previously
    committed data files are never dropped or rewritten mid-stream — and the
    final MOR-resolved state still matches the oracle."""
    from hdata_spark.streaming.replay import ReplayConfig

    base, events = small_fixture
    events_dir = _write_event_files(events, str(tmp_path / "events"))
    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "eng")
    table.overwrite(spark, spark.createDataFrame(base))
    v_base = table.current_version()
    stats = stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt,
        cfg=ReplayConfig(stream_compact_delta_files=None),
        max_files_per_trigger=1,
    )
    assert stats["batches"] >= 2
    # fast-append path actually taken: uncompacted deltas remain
    assert table.delta_file_count() > 0
    # append-only manifests: each stream commit's file set is a superset of
    # its predecessor's (a COW merge would REPLACE affected buckets' files)
    prev = None
    for v in range(v_base, table.current_version() + 1):
        m = table._read_manifest(v)
        files = {f for fs in m["buckets"].values() for f in fs}
        if prev is not None:
            assert prev <= files, f"v{v} dropped files committed by v{v-1}"
        prev = files
    for e in ledger.committed_epochs():
        assert ledger.read(e)["commit_kind"] == "fast_append"
    assert_state_equal(table.read(spark).toPandas(), oracle_final_state(base, events))


def test_stream_delta_threshold_compaction(spark, tmp_path, small_fixture):
    """Crossing stream_compact_delta_files triggers an in-stream compaction;
    state stays correct and the delta backlog is bounded by ~one batch."""
    from hdata_spark.streaming.replay import ReplayConfig

    base, events = small_fixture
    events_dir = _write_event_files(events, str(tmp_path / "events"))
    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "eng")
    table.overwrite(spark, spark.createDataFrame(base))
    stats = stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt,
        cfg=ReplayConfig(stream_compact_delta_files=4),
        max_files_per_trigger=1,
    )
    assert stats["batches"] >= 2
    # compaction ran at least once: backlog can't exceed threshold + one
    # batch's worth of buckets (16 here)
    assert table.delta_file_count() <= 4 + table.n_buckets
    assert_state_equal(table.read(spark).toPandas(), oracle_final_state(base, events))


def test_stream_cow_mode(spark, tmp_path, small_fixture):
    """sink_commit='merge' keeps the read-optimized per-batch COW MERGE."""
    from hdata_spark.streaming.replay import ReplayConfig

    base, events = small_fixture
    events_dir = _write_event_files(events, str(tmp_path / "events"))
    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "eng")
    table.overwrite(spark, spark.createDataFrame(base))
    stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt,
        cfg=ReplayConfig(sink_commit="merge"),
    )
    assert table.delta_file_count() == 0
    for e in ledger.committed_epochs():
        assert ledger.read(e)["commit_kind"] == "merge"
    assert_state_equal(table.read(spark).toPandas(), oracle_final_state(base, events))


def test_stream_schema_evolution(spark, tmp_path):
    """Schema-change events through the STREAM path: final schema + values
    match the batch replayer on the same log."""
    from hdata_spark.fixtures import CDCFixtureConfig, generate_base, generate_events
    from hdata_spark.streaming.replay import ReplayConfig, replay

    cfg = CDCFixtureConfig(
        seed=43, n_repos=8, paths_per_repo=12, hot_repos=0,
        n_events=1_200, epoch_size=400, base_rows=60,
        schema_changes=(
            ("add", "stars", "int"),
            ("rename", "stars", "stargazers"),
            ("widen", "stargazers", "bigint"),
        ),
    )
    base, events = generate_base(cfg), generate_events(cfg)
    events_dir = _write_event_files(events, str(tmp_path / "events"))

    t_s, l_s, m_s, r_s, ckpt = _mk(tmp_path, "stream")
    t_s.overwrite(spark, spark.createDataFrame(base))
    stream_replay(spark, events_dir, t_s, l_s, m_s, r_s, ckpt)

    t_b, l_b, m_b, r_b, _ = _mk(tmp_path, "batch")
    t_b.overwrite(spark, spark.createDataFrame(base))
    replay(spark, spark.createDataFrame(events), t_b, l_b, m_b, r_b, ReplayConfig())

    assert t_s.columns() == t_b.columns()
    assert t_s.columns()[-1] == "stargazers"
    assert {c["name"]: c["type"] for c in t_s.schema_spec()}["stargazers"] == "bigint"
    assert sha256_fingerprint(t_s.read(spark).toPandas()) == sha256_fingerprint(
        t_b.read(spark).toPandas()
    )


def test_stream_batch_convergence(spark, tmp_path, small_fixture):
    """Stream replay and batch replay of one log -> identical final table."""
    from hdata_spark.streaming.replay import ReplayConfig, replay

    base, events = small_fixture
    events_dir = _write_event_files(events, str(tmp_path / "events"))

    t_s, l_s, m_s, r_s, ckpt = _mk(tmp_path, "stream")
    t_s.overwrite(spark, spark.createDataFrame(base))
    stream_replay(spark, events_dir, t_s, l_s, m_s, r_s, ckpt)

    t_b, l_b, m_b, r_b, _ = _mk(tmp_path, "batch")
    t_b.overwrite(spark, spark.createDataFrame(base))
    replay(
        spark, spark.createDataFrame(events), t_b, l_b, m_b, r_b, ReplayConfig()
    )
    assert sha256_fingerprint(t_s.read(spark).toPandas()) == sha256_fingerprint(
        t_b.read(spark).toPandas()
    )


def test_stream_concurrent_writer_schema_change_not_skipped(spark, tmp_path):
    """A WAL segment landing BETWEEN the schema-change profile and the
    stream's AvailableNow snapshot (a concurrent writer) must still get its
    schema_change applied: the per-batch inputFiles() coverage check
    escalates any unprofiled file back to the full schema-change scan
    instead of trusting the stale maybe_sc=False profile."""
    from hdata_spark.fixtures import CDCFixtureConfig, generate_base, generate_events
    from hdata_spark.streaming.replay import ReplayConfig, replay

    cfg = CDCFixtureConfig(
        seed=44, n_repos=8, paths_per_repo=12, hot_repos=0,
        n_events=1_200, epoch_size=400, base_rows=60,
    )
    base, events = generate_base(cfg), generate_events(cfg)
    first = events[events["epoch"] < 2].copy()
    injected = events[events["epoch"] >= 2].copy()
    # Hand-craft a schema_change inside the injected (racing) segment.
    i = injected.index[0]
    injected.loc[i, ["op", "repo", "path", "commit", "lang", "content"]] = [
        "schema_change", None, None, None, None, None,
    ]
    injected.loc[i, ["sc_kind", "sc_column", "sc_arg"]] = ["add", "stars", "int"]
    events_dir = str(tmp_path / "events")
    _write_event_files(first, events_dir)  # profile sees ONLY these

    table, ledger, metrics, registry, ckpt = _mk(tmp_path, "race")
    table.overwrite(spark, spark.createDataFrame(base))
    stream_replay(
        spark, events_dir, table, ledger, metrics, registry, ckpt,
        max_files_per_trigger=1,
        _post_profile_hook=lambda: _write_event_files(injected, events_dir),
    )
    assert "stars" in table.columns()  # the racing change was NOT skipped

    # Final state converges with a batch replay of the full log.
    full = pd.concat([first, injected]).sort_values("lsn")
    t_b, l_b, m_b, r_b, _ = _mk(tmp_path, "batch")
    t_b.overwrite(spark, spark.createDataFrame(base))
    replay(spark, spark.createDataFrame(full), t_b, l_b, m_b, r_b, ReplayConfig())
    assert sha256_fingerprint(table.read(spark).toPandas()) == sha256_fingerprint(
        t_b.read(spark).toPandas()
    )


def test_delta_footer_stats_raises_on_all_null_lsn(tmp_path):
    """A staged delta bucket with rows but an all-NULL _lsn violates the
    non-null contract; delta_footer_stats must raise rather than silently
    drop the bucket (which would undercount applied_events)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from hdata_spark.sinks.snapshot import delta_footer_stats

    root = str(tmp_path)
    rel = os.path.join("data", "delta_x", "bucket=0", "part-0.parquet")
    os.makedirs(os.path.dirname(os.path.join(root, rel)), exist_ok=True)
    tbl = pa.table({
        "repo": ["a", "b"],
        "_lsn": pa.array([None, None], type=pa.int64()),
    })
    pq.write_table(tbl, os.path.join(root, rel))
    with pytest.raises(ValueError, match="non-null"):
        delta_footer_stats(root, {0: [rel]})
