"""Job-spec surface: reader/writer registry + ${var} substitution parity.

Covers the reference's EP1/EP2 lifecycle semantics (SURVEY §3): config ->
reader -> writer, separator/null-literal/start-row conventions, and the
upsert writer path through the snapshot MERGE sink.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hdata_spark.jobspec import (
    READERS,
    WRITERS,
    read_source,
    run_job,
    substitute_vars,
)


def test_var_substitution():
    spec = {
        "reader": {"name": "csv", "path": "/data/${day}/in.csv"},
        "writer": {"name": "parquet", "path": "/out/${day}", "mode": "${mode}"},
    }
    out = substitute_vars(spec, {"day": "20260816", "mode": "overwrite"})
    assert out["reader"]["path"] == "/data/20260816/in.csv"
    assert out["writer"]["path"] == "/out/20260816"
    # unknown vars pass through untouched (reference leaves them verbatim)
    keep = substitute_vars({"reader": {"x": "${nope}"}}, {})
    assert keep["reader"]["x"] == "${nope}"


def test_csv_roundtrip_with_header_and_nulls(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("a,b,c\n1,x,2024-01-01\n2,,2024-01-02\n")
    out = str(tmp_path / "out_csv")
    stats = run_job(
        spark,
        {
            "reader": {
                "name": "csv",
                "path": str(src),
                "start.row": 1,
                "schema": "id,name,day",
            },
            "writer": {
                "name": "csv",
                "path": out,
                "null.string": "NULL",
                "include.column.names": "false",
            },
        },
    )
    assert stats["rows_written"] == 2
    lines = sorted(
        ln
        for f in (tmp_path / "out_csv").glob("*.csv")
        for ln in f.read_text().splitlines()
    )
    assert lines == ["1,x,2024-01-01", "2,NULL,2024-01-02"]


def test_text_reader_separator_and_arity_filter(spark, tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("a\t1\tx\nb\t2\ty\nshort\n")
    df = read_source(
        spark,
        {
            "name": "text",
            "path": str(src),
            "fields.separator": "\\t",
            "schema": "k,v,tag",
            "fields.count.filter": 3,
        },
    )
    rows = {(r["k"], r["v"], r["tag"]) for r in df.collect()}
    assert rows == {("a", "1", "x"), ("b", "2", "y")}  # `short` filtered


def test_text_writer_null_literal_and_join(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", None, 1), ("b", "y", None)], "k string, v string, n int"
    )
    out = str(tmp_path / "out_text")
    from hdata_spark.jobspec import write_sink

    write_sink(df, {"name": "text", "path": out, "fields.separator": "|"})
    lines = sorted(
        ln
        for f in (tmp_path / "out_text").glob("*.txt")
        for ln in f.read_text().splitlines()
    )
    assert lines == ["a|NULL|1", "b|y|NULL"]


def test_parquet_to_snapshot_upsert_job(spark, tmp_path):
    """reader -> snapshot MERGE writer: the reference's upsert path
    (JDBCWriter.java:128-145) through the job-spec surface."""
    from hdata_spark.sinks.snapshot import SnapshotTable

    base = pd.DataFrame(
        [
            {"repo": "o/r", "path": "a.py", "commit": "c0", "lang": "python",
             "content": "v0", "lsn": 1},
            {"repo": "o/r", "path": "b.py", "commit": "c1", "lang": "python",
             "content": "v1", "lsn": 2},
        ]
    )
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(base).write.parquet(src)
    tdir = str(tmp_path / "snap")
    run_job(
        spark,
        {
            "reader": {"name": "parquet", "path": src},
            "writer": {
                "name": "snapshot",
                "path": tdir,
                "upsert.columns": "repo,path",
                "lsn.column": "lsn",
            },
        },
    )
    # second batch updates a.py (higher lsn) and must win; stale lsn loses
    upd = pd.DataFrame(
        [
            {"repo": "o/r", "path": "a.py", "commit": "c9", "lang": "python",
             "content": "v9", "lsn": 9},
            {"repo": "o/r", "path": "b.py", "commit": "cX", "lang": "python",
             "content": "stale", "lsn": 0},
        ]
    )
    src2 = str(tmp_path / "src2.parquet")
    spark.createDataFrame(upd).write.parquet(src2)
    run_job(
        spark,
        {
            "reader": {"name": "parquet", "path": src2},
            "writer": {
                "name": "snapshot",
                "path": tdir,
                "upsert.columns": "repo,path",
                "lsn.column": "lsn",
            },
        },
    )
    out = SnapshotTable(tdir).read(spark).toPandas().set_index("path")
    assert out.loc["a.py", "content"] == "v9"
    assert out.loc["b.py", "content"] == "v1"  # stale lsn 0 lost to lsn 2


def test_snapshot_upsert_without_lsn_column_updates_on_rerun(spark, tmp_path):
    """An lsn-less upsert job stamps the batch one past the stored max LSN,
    so re-running with changed payloads UPDATES keys (the reference's ON
    DUPLICATE KEY UPDATE re-run semantics) instead of silently losing to the
    sink's strict s.lsn > t._lsn rule."""
    from hdata_spark.sinks.snapshot import SnapshotTable

    def job(src):
        run_job(
            spark,
            {
                "reader": {"name": "parquet", "path": src},
                "writer": {
                    "name": "snapshot",
                    "path": str(tmp_path / "snap"),
                    "upsert.columns": "repo,path",
                },
            },
        )

    v0 = pd.DataFrame(
        [{"repo": "o/r", "path": "a.py", "commit": "c0", "lang": "python",
          "content": "v0"}]
    )
    src0 = str(tmp_path / "s0.parquet")
    spark.createDataFrame(v0).write.parquet(src0)
    job(src0)
    v1 = v0.assign(commit="c1", content="v1")
    src1 = str(tmp_path / "s1.parquet")
    spark.createDataFrame(v1).write.parquet(src1)
    job(src1)
    out = SnapshotTable(str(tmp_path / "snap")).read(spark).toPandas()
    assert len(out) == 1 and out.iloc[0]["content"] == "v1"


def test_excel_roundtrip(spark, tmp_path):
    pytest.importorskip("openpyxl")
    df = spark.createDataFrame([("a", "1"), ("b", "2")], "k string, v string")
    out = str(tmp_path / "t.xlsx")
    from hdata_spark.jobspec import write_sink

    write_sink(df, {"name": "excel", "path": out})
    back = read_source(
        spark, {"name": "excel", "path": out, "include.column.names": "true"}
    )
    assert {tuple(r) for r in back.collect()} == {("a", "1"), ("b", "2")}


def test_unknown_plugin_raises(spark):
    with pytest.raises(ValueError, match="unknown reader"):
        read_source(spark, {"name": "nope"})
    from hdata_spark.jobspec import write_sink

    with pytest.raises(ValueError, match="unknown writer"):
        write_sink(spark.range(1), {"name": "nope"})


def test_registry_covers_reference_plugin_families():
    """SURVEY §2.1/2.2 coverage audit: each reference plugin family maps to
    a registered reader/writer (ftp/mongodb/hbase are connector-dependent,
    served by the same text/parquet paths at the API level)."""
    assert {"parquet", "csv", "text", "jdbc", "hive", "http", "kafka", "excel"} <= set(
        READERS
    )
    assert {"parquet", "csv", "text", "console", "jdbc", "kafka", "snapshot",
            "excel"} <= set(WRITERS)
