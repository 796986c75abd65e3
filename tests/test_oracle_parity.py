"""Driver-style oracle parity: every QUERIES entry vs its DuckDB ORACLES SQL.

Mimics the external driver's check (CORRECTNESS_r{N}.json): run the Spark
query and the DuckDB SQL on the same parquet, compare row count, column
names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from hdata_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _type_family(t: str) -> str:
    """Collapse a declared column type to a cross-engine family.

    The driver's value-hash distinguishes DuckDB HUGEINT (int128, from a bare
    ``sum(INTEGER)``) from Spark's int64 even when values are equal — so
    HUGEINT maps to its own family that no Spark type can match, forcing
    oracles to ``CAST(sum(..) AS BIGINT)``.
    """
    t = t.strip().lower()
    if t.startswith(("decimal", "numeric")):
        return "dec"
    if t.startswith(("array", "list")) or t.endswith("[]"):
        return "arr"
    if t.startswith(("struct", "row", "map")):
        return "struct"
    if t.startswith("timestamp"):
        return "ts"
    return {
        "tinyint": "i64", "smallint": "i64", "int": "i64",
        "integer": "i64", "bigint": "i64", "utinyint": "i64",
        "usmallint": "i64", "uinteger": "i64",
        "hugeint": "i128", "ubigint": "i128", "uhugeint": "i128",
        "float": "f", "real": "f", "double": "f",
        "string": "s", "varchar": "s",
        "boolean": "b", "date": "date", "binary": "bin", "blob": "bin",
    }.get(t, t)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    # None-safe total order (grouping sets emit NULL group keys)
    return sorted(
        normed, key=lambda t: tuple((v is None, str(v)) for v in t)
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    # Declared-type parity (the driver hash-distinguishes int128 from int64)
    duck_types = {
        r[0]: r[1]
        for r in duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    }
    spark_types = dict(sdf.dtypes)
    for col in spark_cols:
        sf, df_ = _type_family(spark_types[col]), _type_family(duck_types[col])
        assert sf == df_, (
            f"{name}.{col}: type family mismatch spark={spark_types[col]}"
            f"({sf}) vs duckdb={duck_types[col]}({df_})"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    a, b = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mismatches}"


def test_all_queries_have_entries():
    # every oracle key maps to a query; queries without oracle are allowed
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 20
