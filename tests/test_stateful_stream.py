"""Custom stateful streaming (applyInPandasWithState) + watermark semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hdata_spark.streaming.stateful import (
    repo_progress_stream,
    windowed_event_counts_stream,
)


def test_repo_progress_state_accumulates_across_batches(spark, tmp_path):
    """Per-repo state must carry across micro-batches: with one file per
    trigger, the last update row per repo equals the global totals, and a
    repo touched in both batches emits (at least) two increasing rows."""
    wal = str(tmp_path / "wal")
    b1 = pd.DataFrame(
        {"repo": ["a", "a", "b"], "lsn": [1, 2, 3], "path": ["x"] * 3}
    )
    b2 = pd.DataFrame({"repo": ["a", "c"], "lsn": [4, 5], "path": ["x"] * 2})
    spark.createDataFrame(b1).repartition(1).write.parquet(wal + "/f1")
    spark.createDataFrame(b2).repartition(1).write.parquet(wal + "/f2")
    # flat dir of files: rewrite as two files in one directory
    import glob
    import os
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, d in enumerate(("f1", "f2")):
        src = glob.glob(f"{wal}/{d}/part-*.parquet")[0]
        shutil.copy(src, f"{flat}/{i:02d}.parquet")

    out = repo_progress_stream(
        spark, flat, str(tmp_path / "ckpt")
    ).collect()
    # final state per repo = the row from the highest batch it appeared in
    final = {}
    for r in sorted(out, key=lambda r: r["batch_id"]):
        final[r["repo"]] = (r["applied_events"], r["max_lsn"])
    assert final["a"] == (3, 4)  # 2 events in batch 1 + 1 in batch 2
    assert final["b"] == (1, 3)
    assert final["c"] == (1, 5)
    a_rows = [
        (r["applied_events"], r["max_lsn"]) for r in out if r["repo"] == "a"
    ]
    assert (2, 2) in a_rows and (3, 4) in a_rows  # state visible mid-stream


def test_watermark_drops_late_events_from_finalized_windows(spark, tmp_path):
    """Append-mode watermark contract: a window is emitted once when the
    watermark passes its end, and an event arriving later than the lateness
    bound cannot change it."""
    import glob
    import os
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    # Spark 3.4+ two-watermark semantics: late-event FILTERING uses the
    # watermark as of the previous completed batch, eviction uses the
    # current one — so the late row must arrive >= 2 batches after the
    # events that advanced the watermark past its window.
    batches = [
        # batch 0: 3 events in [00:00, 01:00) + one at 02:30 -> after this
        # batch the watermark is 02:00
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["2026-01-01 00:10", "2026-01-01 00:20",
                     "2026-01-01 00:40", "2026-01-01 02:30"]
                ),
                "v": [1, 2, 3, 4],
            }
        ),
        # batch 1: fresh event at 05:00; filtering watermark 02:00 evicts+
        # emits windows 00:00 (n=3) and 02:00 (n=1); watermark -> 04:30
        pd.DataFrame({"ts": pd.to_datetime(["2026-01-01 05:00"]), "v": [10]}),
        # batch 2: a LATE row for the finalized 00:00 window (00:50 <<
        # filtering watermark 04:30) -> must be dropped
        pd.DataFrame(
            {"ts": pd.to_datetime(["2026-01-01 00:50", "2026-01-01 06:00"]),
             "v": [9, 11]},
        ),
    ]
    for i, pdf in enumerate(batches):
        tmp = str(tmp_path / f"stage{i}")
        spark.createDataFrame(pdf).repartition(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{flat}/{i:02d}.parquet"
        )

    out = windowed_event_counts_stream(
        spark,
        flat,
        str(tmp_path / "ckpt"),
        window_duration="1 hour",
        lateness="30 minutes",
    )
    rows = {
        r["window_start"].strftime("%H:%M"): r["n_events"] for r in out.collect()
    }
    # first window finalized with 3 events; the late 00:50 row was DROPPED
    # (it neither changed the emitted row nor produced a duplicate window)
    assert rows == {"00:00": 3, "02:00": 1}


def test_progress_stream_resumes_from_checkpoint(spark, tmp_path):
    """Restarting the stateful query with the same checkpoint must resume
    state, not recount: a new file after restart increments prior totals."""
    import glob
    import os
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)

    def add_file(idx: int, pdf: pd.DataFrame) -> None:
        tmp = str(tmp_path / f"s{idx}")
        spark.createDataFrame(pdf).repartition(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{flat}/{idx:02d}.parquet"
        )

    add_file(0, pd.DataFrame({"repo": ["a"], "lsn": [1], "path": ["x"]}))
    ckpt = str(tmp_path / "ckpt")
    out1 = repo_progress_stream(
        spark, flat, ckpt, output_dir=str(tmp_path / "out1")
    )
    assert {(r["repo"], r["applied_events"]) for r in out1.collect()} == {("a", 1)}

    add_file(1, pd.DataFrame({"repo": ["a"], "lsn": [7], "path": ["x"]}))
    out2 = repo_progress_stream(
        spark, flat, ckpt, output_dir=str(tmp_path / "out2")
    )
    rows = {(r["repo"], r["applied_events"], r["max_lsn"]) for r in out2.collect()}
    # only the NEW file was processed, on top of RESTORED state (1+1 events,
    # max lsn from the new file) — not a recount from scratch
    assert rows == {("a", 2, 7)}


def test_windowed_stream_resumes_from_checkpoint(spark, tmp_path):
    """The windowed query's file sink must recover from its checkpoint:
    re-invoking with the same checkpoint tails only new WAL files and
    appends newly finalized windows (the memory sink could not do this)."""
    import glob
    import os
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)

    def add_file(idx, ts_list):
        tmp = str(tmp_path / f"s{idx}")
        spark.createDataFrame(
            pd.DataFrame({"ts": pd.to_datetime(ts_list), "v": [1] * len(ts_list)})
        ).repartition(1).write.parquet(tmp)
        shutil.copy(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{flat}/{idx:02d}.parquet"
        )

    ckpt = str(tmp_path / "ckpt")
    add_file(0, ["2026-01-01 00:10", "2026-01-01 02:30"])
    out1 = windowed_event_counts_stream(spark, flat, ckpt)
    n1 = out1.count()  # nothing finalized yet (single batch)
    # second invocation, same checkpoint: new file advances the watermark
    add_file(1, ["2026-01-01 06:00"])
    out2 = windowed_event_counts_stream(spark, flat, ckpt)
    rows = {
        r["window_start"].strftime("%H:%M"): r["n_events"] for r in out2.collect()
    }
    assert rows.get("00:00") == 1 and rows.get("02:00") == 1
    assert out2.count() >= n1
