"""Iceberg sink SQL surface — unit-tested without a catalog (no runtime jar
in the sandbox; `IcebergTable` refuses to construct, `SnapshotTable` is the
fallback with identical semantics)."""

from __future__ import annotations

import pytest

from hdata_spark.sinks.iceberg import (
    compact_sql,
    create_table_sql,
    evolve_sql,
    iceberg_available,
    merge_sql,
    read_sql,
)

COLS = [
    ("repo", "STRING"), ("path", "STRING"), ("commit", "STRING"),
    ("lang", "STRING"), ("content", "STRING"), ("content_sha256", "STRING"),
]


def test_create_table_buckets_on_merge_key():
    s = create_table_sql("lake.db.repo_content", COLS, n_buckets=4096)
    assert "PARTITIONED BY (bucket(4096, `repo`, `path`))" in s
    assert "'write.merge.mode' = 'merge-on-read'" in s
    assert "`_lsn` BIGINT" in s and "`_op` STRING" in s


def test_merge_sql_is_lsn_guarded_lww():
    s = merge_sql("lake.db.t", "batch", [c for c, _ in COLS])
    assert "ON t.`repo` = s.`repo` AND t.`path` = s.`path`" in s
    assert "WHEN MATCHED AND s.`lsn` > t.`_lsn`" in s  # strict: replay no-op
    assert "WHEN NOT MATCHED THEN" in s
    # delete becomes a tombstone, never a row removal
    assert "CASE WHEN s.`op` = 'delete' THEN 'd' ELSE 'u' END" in s
    # keys are matched, not updated
    assert "t.`repo` = s.`repo`," not in s.split("UPDATE SET")[1]


def test_evolve_sql_add_rename_widen():
    assert evolve_sql("t", "add", "stars", "INT") == [
        "ALTER TABLE t ADD COLUMN `stars` INT"
    ]
    assert evolve_sql("t", "rename", "stars", "stargazers") == [
        "ALTER TABLE t RENAME COLUMN `stars` TO `stargazers`"
    ]
    assert evolve_sql("t", "widen", "stargazers", "BIGINT") == [
        "ALTER TABLE t ALTER COLUMN `stargazers` TYPE BIGINT"
    ]
    with pytest.raises(ValueError):
        evolve_sql("t", "drop", "x", None)


def test_compact_and_read_sql():
    stmts = compact_sql("lake", "db.t")
    assert "rewrite_data_files" in stmts[0] and "expire_snapshots" in stmts[1]
    r = read_sql("lake.db.t", ["repo", "path"])
    assert r == "SELECT `repo`, `path` FROM lake.db.t WHERE `_op` <> 'd'"


def test_iceberg_not_available_in_sandbox(spark):
    assert not iceberg_available(spark, "lake")
    from hdata_spark.sinks.iceberg import IcebergTable

    with pytest.raises(RuntimeError, match="not configured"):
        IcebergTable(spark, "lake.db.t", COLS)
