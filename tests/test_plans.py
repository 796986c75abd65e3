"""Physical-plan regression guards.

Correctness tests prove the operators right; these prove they stay RIGHT AT
SCALE: filters push to the parquet scan, small dims broadcast, the LWW dedup
never falls back to SortAggregate, and no row-at-a-time Python UDF
(`BatchEvalPython`) exists anywhere — only Arrow-vectorized exchanges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdata_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_tpch_q1_filter_pushed_to_scan(spark):
    s = full_explain(QUERIES["tpch_q1"](spark, SF_DIR))
    assert "PushedFilters" in s
    assert "l_shipdate" in s.split("PushedFilters")[1][:200]


def test_tpch_q5_broadcasts_dimensions(spark):
    s = plan_of(QUERIES["tpch_q5_region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in s


def test_lww_dedup_no_sort_aggregate(spark):
    """The dedup agg must stay HashAggregate (fixed-width max(lsn) buffer);
    SortAggregate here would externally sort the full event stream."""
    from hdata_spark.operators.dedup import lww_latest

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df = lww_latest(
        ev.withColumnRenamed("event_id", "lsn"), keys=("user_id",), order_col="lsn"
    )
    s = plan_of(df)
    assert "HashAggregate" in s
    assert "SortAggregate" not in s


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read all 8 event columns."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    s = full_explain(ev.select("event_id", "user_id"))
    read_schema = s.split("ReadSchema:")[1].splitlines()[0]
    assert "event_id" in read_schema and "user_id" in read_schema
    assert "props" not in read_schema and "event_type" not in read_schema


def test_snapshot_read_prunes_buckets(spark, tmp_path):
    """Bucket-pruned read opens only the requested buckets' files
    (manifest-level pruning, the Iceberg partition-pruning analog)."""
    import pandas as pd

    from hdata_spark.sinks.snapshot import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"), n_buckets=8)
    rows = pd.DataFrame(
        [
            {"repo": f"o/r{i}", "path": f"f{i}.py", "commit": "c", "lang": "python",
             "content": f"v{i}"}
            for i in range(50)
        ]
    )
    t.overwrite(spark, spark.createDataFrame(rows))
    pruned = t.read_internal(spark, buckets=[0])
    s = full_explain(pruned)
    # only one bucket directory's file should appear in the scan
    assert s.count("bucket=") <= 2  # location string mentions bucket=0 path(s)
    full = t.read_internal(spark)
    assert pruned.count() < full.count()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_row_python_udfs_anywhere(spark, name):
    """input_hint mandate: zero per-row Python. Arrow exchanges
    (ArrowEvalPython / MapInPandas) are the only Python allowed."""
    if name.startswith("cdc_engine"):
        pytest.skip("engine e2e entries run side effects")
    df = QUERIES[name](spark, SF_DIR)
    s = plan_of(df)
    assert "BatchEvalPython" not in s, f"{name} uses a row-at-a-time Python UDF"


def test_ivf_assign_no_window_no_sort(spark):
    """The IVF argmax must be a max_by hash aggregate: a row_number window
    would shuffle n_cells copies of every embedding through a sort."""
    from hdata_spark.operators.similarity import ivf_assign

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    s = plan_of(ivf_assign(e, n_cells=16))
    assert "Window" not in s
    assert "Sort " not in s and "SortAggregate" not in s
    assert "HashAggregate" in s or "ObjectHashAggregate" in s


def test_simhash_pairs_single_signature_pass(spark):
    """The candidate self-join must read a MATERIALIZED signature frame on
    both sides (one signature pass), not recompute the pipeline per side —
    and stay a sort-free shuffled-hash join."""
    from hdata_spark.operators.text_dedup import simhash_near_pairs

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = plan_of(simhash_near_pairs(d, max_hamming=6))
    # the documents parquet scan lives behind the checkpoint, not inlined
    # twice into the join subtrees
    assert s.count("Scan parquet") == 0
    assert s.count("Scan ExistingRDD") == 2
    assert "ShuffledHashJoin" in s
    assert "SortMergeJoin" not in s


def test_pandas_udf_shows_arrow_exchange(spark):
    from hdata_spark.functions.text import sha256_pudf

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = plan_of(d.select(sha256_pudf(F.col("text"))))
    assert "ArrowEvalPython" in s


def test_hyperplane_signature_slim_hash_agg(spark):
    """The bit aggregation must not carry the embedding payload (that would
    demote it to SortAggregate and shuffle n_planes copies of every vector)."""
    from hdata_spark.operators.similarity import hyperplane_signature

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    s = plan_of(hyperplane_signature(e, n_planes=8))
    assert "SortAggregate" not in s
    assert "HashAggregate" in s
    assert "ShuffledHashJoin" in s and "SortMergeJoin" not in s
