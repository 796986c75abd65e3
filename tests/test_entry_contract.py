"""Driver-contract checks: entry() smoke + cdc_engine_replay oracle parity."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["user_id", "last_event_id", "last_value"]


def test_every_query_has_callable_and_most_have_oracles(spark):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20
    # >90% of queries are value-checked against DuckDB
    assert len(oracles) / len(qs) > 0.9


def test_cdc_engine_replay_matches_oracle(spark):
    """The REAL engine pipeline (replay -> MERGE sink -> read) vs DuckDB LWW."""
    df = entry_mod.queries()["cdc_engine_replay"](spark, SF_DIR)
    got = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = sorted(tuple(r) for r in con.execute(
        entry_mod.oracle_sql()["cdc_engine_replay"]
    ).fetchall())
    assert got == want


def test_cdc_engine_stream_replay_matches_oracle(spark):
    """Same check through the Structured Streaming path (foreachBatch)."""
    df = entry_mod.queries()["cdc_engine_stream_replay"](spark, SF_DIR)
    got = sorted(tuple(r) for r in df.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = sorted(tuple(r) for r in con.execute(
        entry_mod.oracle_sql()["cdc_engine_stream_replay"]
    ).fetchall())
    assert got == want
