"""Last-writer-wins dedup — the keyed heart of the CDC engine.

The reference has no dedup at all: its writer pool consumes the ring buffer
with NO key affinity (hdata-core/.../core/HData.java:108-117), so correctness
there depends on MySQL's ON DUPLICATE KEY UPDATE executing upserts in arrival
order. We make the semantics explicit: within any batch, the event with the
highest LSN per (repo, path) wins; everything else is discarded before the
merge. This is what makes the apply stage order-free and idempotent.

Two implementations:

- `lww_latest` (default): ``groupBy(keys).agg(max_by(struct(all), order))``.
  One shuffle with map-side partial aggregation — each map task pre-reduces to
  one candidate row per key before the exchange, so shuffle volume is
  O(distinct keys per task), not O(events). At 10^10 events this is the only
  acceptable plan.
- `lww_latest_window`: ``row_number() OVER (PARTITION BY keys ORDER BY lsn
  DESC) = 1``. Same result, but sorts every group and shuffles every row;
  kept for cross-checking and for callers that need losers too.

Ties: LSNs are unique by construction (global sequence); ``order_col`` must be
a total order. For multi-column tiebreaks pass a struct column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_latest(
    df: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    order_col: str = "lsn",
) -> DataFrame:
    """Keep the max-`order_col` row per key; columns preserved in order."""
    payload = [c for c in df.columns if c not in keys]
    winner = df.groupBy(*keys).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(order_col)).alias("_w")
    )
    return winner.select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload]).select(
        *df.columns
    )


def lww_latest_window(
    df: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    order_col: str = "lsn",
) -> DataFrame:
    """Window-function variant (row_number over desc order)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
