"""Operator showcase: every query exists twice — idiomatic DataFrame code here
and an equivalent ANSI-SQL oracle (DuckDB) in ORACLES.

Naming groups:

- ``cdc_*``  — the CDC engine's core semantics re-expressed over the driver's
  `events` table (event_id == LSN, user_id == key): LWW dedup, final-state
  replay, upsert merge, epoch/partition metrics. These mirror what the
  replay pipeline does to the repo-content fixtures, in an oracle-checkable
  form.
- ``ref_*``  — reference-parity scalar/scan semantics (hdata plugin family):
  range splitting (JDBCSplitter), null substitution + text-sink rendering
  (JDBCReader/HDFSWriter/CSVWriter), type coercion (TypeConvertUtils),
  shard-table union (JDBCSplitter table[001-100]).
- ``tpch_*`` / ``window_*`` / ``setop_*`` — relational operator coverage
  (agg, multi-join, window, top-k, set ops) the target engine adds over the
  reference (which has none of these).
- ``doc_*`` / ``emb_*`` — training-data pipeline ops: dedup family, text
  analysis, fingerprinting, ANN similarity.

Determinism rules (driver hash-compares values against DuckDB):

- money/metric aggregates go through DECIMAL so sums are exact, then cast to
  double (same exact decimal -> same double bits on both engines);
- every float output is explicitly rounded;
- every top-k has a total-order tiebreak;
- identical function semantics verified test-side (tests/test_oracle_parity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# =====================================================================
# cdc_* — CDC semantics over the generic `events` stream table
# =====================================================================

@query(
    "cdc_lww_latest",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def cdc_lww_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-writer-wins latest state per key (max_by partial-agg plan).

    Engine counterpart of the per-key upsert resolution
    (reference: hdata-jdbc/.../writer/jdbc/JDBCWriter.java:128-145).
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value"), F.col("event_id")
        ).alias("w")
    ).select(
        "user_id",
        F.col("w.event_id").alias("last_event_id"),
        F.col("w.event_type").alias("last_event_type"),
        F.col("w.value").alias("last_value"),
    )


@query(
    "cdc_final_state",
    """
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay final state with delete semantics ('error' = tombstone op)."""
    ev = load(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(F.struct("event_id", "event_type", "value"), F.col("event_id")).alias("w")
    )
    return latest.filter(F.col("w.event_type") != "error").select(
        "user_id",
        F.col("w.event_id").alias("last_event_id"),
        F.col("w.value").alias("last_value"),
    )


@query(
    "cdc_upsert_merge",
    """
    WITH h AS (SELECT max(event_id) // 2 AS half FROM events),
    base AS (
        SELECT user_id, event_id, event_type, value
        FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id
                                             ORDER BY event_id DESC) rn
              FROM events e, h WHERE e.event_id <= h.half)
        WHERE rn = 1),
    delta AS (
        SELECT user_id, event_id, event_type, value
        FROM (SELECT e.*, row_number() OVER (PARTITION BY user_id
                                             ORDER BY event_id DESC) rn
              FROM events e, h WHERE e.event_id > h.half)
        WHERE rn = 1)
    SELECT coalesce(d.user_id, b.user_id) AS user_id,
           coalesce(d.event_id, b.event_id) AS event_id,
           coalesce(d.event_type, b.event_type) AS event_type,
           coalesce(d.value, b.value) AS value
    FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
    """,
)
def cdc_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style upsert: delta half of the log upserts over the base half.

    The DataFrame shape of Iceberg `MERGE INTO` / MySQL ON DUPLICATE KEY
    (hdata-jdbc/.../writer/jdbc/JDBCWriter.java:128-145): full-outer join on
    the key, delta wins where present.
    """
    ev = load(spark, sf_dir, "events")
    half = ev.agg(F.floor(F.max("event_id") / 2).cast("long").alias("half"))

    def latest(df):
        return df.groupBy("user_id").agg(
            F.max_by(F.struct("event_id", "event_type", "value"), F.col("event_id")).alias("w")
        ).select(
            "user_id",
            F.col("w.event_id").alias("event_id"),
            F.col("w.event_type").alias("event_type"),
            F.col("w.value").alias("value"),
        )

    with_half = ev.crossJoin(F.broadcast(half))
    base = latest(with_half.filter(F.col("event_id") <= F.col("half")))
    delta = latest(with_half.filter(F.col("event_id") > F.col("half")))
    b, d = base.alias("b"), delta.alias("d")
    return b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer").select(
        F.coalesce(F.col("d.user_id"), F.col("b.user_id")).alias("user_id"),
        F.coalesce(F.col("d.event_id"), F.col("b.event_id")).alias("event_id"),
        F.coalesce(F.col("d.event_type"), F.col("b.event_type")).alias("event_type"),
        F.coalesce(F.col("d.value"), F.col("b.value")).alias("value"),
    )


@query(
    "cdc_epoch_stats",
    """
    SELECT event_id // 100 AS epoch,
           count(*) AS applied_events,
           max(event_id) AS max_lsn,
           count(DISTINCT user_id) AS n_keys
    FROM events GROUP BY 1
    """,
)
def cdc_epoch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch applied/max-LSN metrics (the metrics-table aggregation)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("event_id") / 100).cast("long").alias("epoch")
    ).agg(
        F.count("*").alias("applied_events"),
        F.max("event_id").alias("max_lsn"),
        F.countDistinct("user_id").alias("n_keys"),
    )


@query(
    "cdc_partition_lag",
    """
    WITH g AS (SELECT max(event_id) AS gmax FROM events)
    SELECT user_id % 8 AS partition_id,
           count(*) AS n_events,
           max(event_id) AS max_lsn,
           any_value(gmax) - max(event_id) AS lag_events
    FROM events, g GROUP BY 1
    """,
)
def cdc_partition_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition lag vs global head LSN (north-star metric shape)."""
    ev = load(spark, sf_dir, "events")
    gmax = ev.agg(F.max("event_id").alias("gmax"))
    return (
        ev.crossJoin(F.broadcast(gmax))
        .groupBy((F.col("user_id") % 8).alias("partition_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.max("event_id").alias("max_lsn"),
            (F.any_value(F.col("gmax")) - F.max("event_id")).alias("lag_events"),
        )
    )


@query(
    "window_topk_per_key",
    """
    SELECT user_id, event_id, event_type, rn
    FROM (SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY event_id DESC) AS rn
          FROM events)
    WHERE rn <= 3
    """,
)
def window_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 latest events per key — the window-function LWW generalization."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.select("user_id", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# =====================================================================
# ref_* — reference plugin-semantics parity
# =====================================================================

@query(
    "ref_split_range",
    """
    WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi,
                      CAST(ceil((max(o_orderkey) - min(o_orderkey) + 1) / 16.0) AS BIGINT) AS step
               FROM orders)
    SELECT (o_orderkey - lo) // step AS chunk_id,
           count(*) AS n_rows,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM orders, b GROUP BY 1
    """,
)
def ref_split_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned scan planning: MIN/MAX probe -> uniform chunks.

    Reference: hdata-jdbc/.../reader/jdbc/JDBCSplitter.java:40-68 +
    JdbcUtils.java:98-131 (SELECT MIN,MAX then equal ranges). Spark equivalent
    of `spark.read.jdbc(column, lowerBound, upperBound, numPartitions)`.
    """
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderkey").alias("lo"),
        F.max("o_orderkey").alias("hi"),
        F.ceil((F.max("o_orderkey") - F.min("o_orderkey") + 1) / 16.0)
        .cast("long")
        .alias("step"),
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.floor((F.col("o_orderkey") - F.col("lo")) / F.col("step"))
            .cast("long")
            .alias("chunk_id")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@query(
    "ref_text_sink_render",
    """
    SELECT o_orderkey,
           concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                     coalesce(nullif(o_orderpriority, 'MEDIUM'), 'NULL'),
                     strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')) AS line
    FROM orders
    """,
)
def ref_text_sink_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-sink row rendering: null -> "NULL" literal, timestamp formatting,
    separator-joined fields.

    Reference: hdata-hdfs/.../writer/hdfs/HDFSWriter.java:173-183 (null
    literal + separator join), hdata-csv/.../writer/csv/CSVWriter.java:121-127
    (timestamp render), null substitution JDBCReader.java:129-132.
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("MEDIUM")), F.lit("NULL")
            ),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        ).alias("line"),
    )


@query(
    "ref_type_coerce",
    """
    SELECT event_type,
           sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS sum_k,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def ref_type_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String->number coercion out of a semi-structured payload.

    Reference: hdata-core/.../util/TypeConvertUtils.java:15-42 (string->int
    ladder); JSON column stands in for the untyped Object[] record cells.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count("*").alias("n"),
    )


@query(
    "ref_shard_union",
    """
    SELECT o_orderstatus, count(*) AS n, sum(o_orderkey) AS key_sum
    FROM (
        SELECT * FROM orders WHERE o_orderkey % 4 = 0
        UNION ALL SELECT * FROM orders WHERE o_orderkey % 4 = 1
        UNION ALL SELECT * FROM orders WHERE o_orderkey % 4 = 2
        UNION ALL SELECT * FROM orders WHERE o_orderkey % 4 = 3
    ) GROUP BY 1
    """,
)
def ref_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-table expansion: table[000-003] -> union of per-shard scans.

    Reference: hdata-jdbc/.../reader/jdbc/JDBCSplitter.java:199-264 (shard
    range expansion into concatenated SELECTs).
    """
    o = load(spark, sf_dir, "orders")
    shards = [o.filter(F.col("o_orderkey") % 4 == i) for i in range(4)]
    u = shards[0]
    for s in shards[1:]:
        u = u.unionByName(s)
    return u.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("key_sum")
    )


# =====================================================================
# tpch_* / window_* / setop_* — relational operator coverage
# =====================================================================

@query(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
                AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (hash agg with decimal-exact sums)."""
    l = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    """
    SELECT o.o_orderkey,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                         (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + agg + deterministic top-k."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                         (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join; dims broadcast (region/nation/supplier)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total (ordered window frame, decimal-exact)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "setop_engaged_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users who both clicked and purchased."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


@query(
    "setop_window_shoppers",
    """
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def setop_window_shoppers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: users who viewed but never purchased."""
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.subtract(buys)  # set EXCEPT (not bag exceptAll)


# =====================================================================
# doc_* — training-data text pipeline
# =====================================================================

@query(
    "doc_dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep lowest doc_id."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


@query(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (whitespace-collapsed, case-folded md5)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias(
            "fingerprint"
        ),
    )


@query(
    "doc_token_stats",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), ' +')) AS n_tokens,
           length(text) AS n_chars_actual,
           length(replace(text, ' ', '')) AS n_nonspace_chars
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats (tokenizer-cost estimator)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " +")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long").alias(
            "n_nonspace_chars"
        ),
    )


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


@query(
    "doc_quality_score",
    f"""
    WITH t AS (
        SELECT doc_id,
               string_split(lower(trim(text)), ' ') AS toks,
               length(text) AS n_chars
        FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(len(list_filter(toks, w -> w IN {_STOPWORDS!r})) * 1.0
                 / len(toks), 6) AS stopword_ratio,
           round((n_chars - len(toks) + 1) * 1.0 / len(toks), 6) AS avg_token_len
    FROM t
    """,
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: stopword ratio + average token length."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    t = d.select(
        "doc_id",
        toks.alias("toks"),
        F.length("text").alias("n_chars"),
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.round(
            F.size(F.filter("toks", lambda w: F.array_contains(stop_arr, w)))
            * F.lit(1.0)
            / F.size("toks"),
            6,
        ).alias("stopword_ratio"),
        F.round(
            (F.col("n_chars") - F.size("toks") + 1) * F.lit(1.0) / F.size("toks"), 6
        ).alias("avg_token_len"),
    )


# =====================================================================
# emb_* — embedding similarity
# =====================================================================

def _dot(a, b):
    """Sequential double-precision dot product (matches DuckDB list ops)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@query(
    "emb_norms",
    """
    SELECT vec_id, label,
           round(sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding])), 6) AS norm
    FROM embeddings
    """,
)
def emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm per embedding (JVM-side higher-order functions, no UDF)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.round(F.sqrt(_dot(F.col("embedding"), F.col("embedding"))), 6).alias("norm"),
    )


@query(
    "emb_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    sims AS (
        SELECT q.query_id, e.vec_id,
               round(
                 list_sum([qv[i]::DOUBLE * e.embedding[i]::DOUBLE
                           for i in range(1, len(qv)+1)])
                 / (sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in qv]))
                    * sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in e.embedding]))),
                 6) AS cosine
        FROM q, embeddings e
        WHERE e.vec_id <> q.query_id)
    SELECT query_id, vec_id, cosine
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, vec_id ASC) rn
          FROM sims)
    WHERE rn <= 10
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query vector (ANN baseline).

    Query side is broadcast (tiny); similarity is computed with JVM
    higher-order functions inside codegen — no Python in the loop. The
    scale path is the LSH/IVF variant in operators/similarity.py.
    """
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    sims = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qv"), F.col("embedding"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "emb_label_centroid_dist",
    """
    SELECT label, count(*) AS n,
           round(avg(sqrt(list_sum([x::DOUBLE * x::DOUBLE for x in embedding]))), 4)
               AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def emb_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats (group agg over vector math)."""
    e = load(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.sqrt(_dot(F.col("embedding"), F.col("embedding")))), 4).alias(
            "avg_norm"
        ),
    )
