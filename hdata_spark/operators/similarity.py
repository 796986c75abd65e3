"""Embedding similarity search: brute-force cosine, IVF cells, LSH buckets.

Built entirely from JVM higher-order array functions (``zip_with`` +
``aggregate`` dot products inside codegen) — no Python per row, no UDF. The
three tiers trade recall for scan cost:

- ``cosine_topk``       : exact, query-side broadcast, O(n * q) — the baseline;
- ``ivf_assign/search`` : IVF — partition vectors into K cells by nearest
  centroid; queries scan ONE cell (~n/K of the data). At 100 TB the cell id
  becomes the table's partition key, so a query prunes to one partition;
- ``hyperplane_lsh_*``  : random-hyperplane signatures (hyperplanes = the
  first P data vectors, deterministic and engine-portable); near-dup pairs
  join on equal signature — a bucketed equi-join, never n^2.

Centroids/hyperplanes derived from leading vec_ids stand in for a k-means
fit: the *query shapes* (assign, prune, bucket-join) are what carries to the
real fit, and determinism is what makes the DuckDB oracles exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product (bit-matches DuckDB list ops)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; a zero-norm side yields NULL (undefined) instead of
    an ANSI DIVIDE_BY_ZERO abort — dirty corpora must not kill the job.
    try_divide (not a when-guard) so each interpreted dot product is
    evaluated exactly once."""
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact top-k by cosine per query; queries broadcast (small side)."""
    sims = (
        vectors.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col(query_vec_col), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ivf_assign(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest 'centroid' (= first n_cells vectors).

    One broadcast cross join + per-vector argmax — the IVF build step. At
    cluster scale the output is written partitioned by `cell`, making search
    a partition-pruned scan.
    """
    centroids = vectors.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cv")
    )
    # SLIM argmax: the embedding payload never enters the aggregate. A
    # row_number window (or a first(embedding) agg) would push n_cells
    # copies of every embedding through a sort/immutable-buffer
    # SortAggregate; instead the agg sees only (id, cell, packed ordering).
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "cell",
        F.round(cosine(F.col(vec_col), F.col("cv")), 9).alias("csim"),
    )
    # max_by ordering must be a fixed-width type to stay a HashAggregate
    # (struct orderings demote to SortAggregate), so pack (csim desc, cell
    # asc) into one BIGINT: csim is exact in 1e-9 units after round(.., 9),
    # and cell < 2^20 by contract. Map-side partial agg collapses the
    # n_cells candidate rows before the exchange.
    # Undefined similarities (NULL from a zero norm, NaN from dirty
    # embeddings) must rank BELOW every real one, not abort the ANSI cast
    # to BIGINT.
    packed = (
        F.round(
            F.coalesce(F.nanvl(F.col("csim"), F.lit(-2.0)), F.lit(-2.0))
            * F.lit(1_000_000_000)
        ).cast("long")
        * F.lit(1 << 20)
        - F.col("cell")
    )
    cells = scored.groupBy(id_col).agg(
        F.max_by(F.col("cell"), packed).alias("cell")
    )
    # Winners join back on the unique id alone (the LWW-dedup pattern):
    # shuffle_hash pins a sort-free join; each embedding crosses the wire
    # exactly once.
    return vectors.select(id_col, vec_col).join(
        cells.hint("shuffle_hash"), id_col, "inner"
    )


def ivf_search(
    assigned: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN search: scan only the query's own cell, exact top-k inside it.

    `queries` must carry (query_id, qv, cell). The probe is an equi-join on
    `cell` — partition pruning at scale, bucketed shuffle here.
    """
    cands = assigned.join(
        F.broadcast(queries), on="cell"
    ).filter(F.col(id_col) != F.col(query_id_col))
    scored = cands.select(
        query_id_col,
        id_col,
        "cell",
        F.round(cosine(F.col("qv"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hyperplane_signature(
    vectors: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH signature (hyperplanes = first n_planes vectors).

    sig = sum_p 2^p * [dot(v, plane_p) > 0] — an integer bucket key. Cosine-
    similar vectors agree on most sign bits, so near-dups collide with high
    probability; collisions are verified exactly afterwards.
    """
    planes = vectors.filter(F.col(id_col) < n_planes).select(
        F.col(id_col).alias("plane"), F.col(vec_col).alias("pv")
    )
    # SLIM bit aggregation — only (id, plane, bit) enters the agg, so it
    # stays a HashAggregate with map-side combine; a first(embedding) here
    # would demote it to SortAggregate AND push n_planes copies of every
    # embedding through the exchange. The payload joins back on the unique
    # id (sort-free shuffle-hash), crossing the wire once.
    bits = (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(planes))
        .select(
            id_col,
            "plane",
            F.when(dot(F.col(vec_col), F.col("pv")) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("bit"),
        )
        .groupBy(id_col)
        .agg(F.sum(F.expr("bit * CAST(pow(2, plane) AS BIGINT)")).alias("sig"))
    )
    return vectors.select(id_col, vec_col).join(
        bits.hint("shuffle_hash"), id_col, "inner"
    )


def lsh_near_dup_pairs(
    vectors: DataFrame,
    min_cosine: float = 0.3,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs: equal LSH signature AND exact cosine >= threshold.

    The candidate join is keyed on `sig` (256 buckets here) — per-bucket
    quadratic, globally near-linear. Exact cosine filters false collisions.
    The signature frame is materialized (localCheckpoint) so the SELF-join
    computes the hyperplane pipeline once, not once per side — the same
    measured pattern as simhash_near_pairs; at production scale stage it to
    the lake instead.
    """
    sig = hyperplane_signature(vectors, n_planes, id_col, vec_col).localCheckpoint(
        eager=False
    )
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.col("a.sig").alias("sig"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
