"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline. Dot products run as
  built-in higher-order functions (zip_with + aggregate) entirely JVM-side;
  the query set is broadcast, so the scan over N vectors never shuffles:
  one pass, then a top-k window per query.
* LSH-bucketed variant (random-hyperplane signs) — the scale path: vectors
  hash into sign-pattern buckets; queries search only their bucket, turning
  the N×Q product into bucket-local joins.

Float vectors are cast to double BEFORE any arithmetic and folded
left-to-right, which makes results bit-identical to the DuckDB oracle
(same IEEE ops in the same order).

At 100 TB: brute force is one broadcast-join map stage (linear scan,
perfectly parallel); IVF/LSH bounds per-query work. Pandas-UDF batched BLAS
would beat per-row exprs on wide vectors; built-ins keep round 1 oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_order_book_spark.functions.hashing import hash64


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn("__norm", F.sqrt(_dot(v, v)))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, rank, cosine). Ties broken by neighbor id
    for cross-engine determinism.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vv")
    )
    sim = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("vv"))
                / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("vv"), F.col("vv"))))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )


def signed_projection_buckets(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign pattern of n_planes pseudo-random
    projections. Plane p's component j = (hash64(p:j) % 1000)/1000 - 0.5 —
    deterministic and oracle-reproducible, no RNG state."""
    dim = F.size(F.col(vec_col))
    v = _as_double(F.col(vec_col))

    def plane_component(p, j):
        return (hash64(F.concat_ws(":", F.lit(p), j.cast("string"))) % 1000) / 1000.0 - 0.5

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), dim - 1),
                lambda x, j: x * plane_component(p, j),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return vectors.select(
        F.col(id_col).alias("vec_id"), F.concat(*bits).alias("bucket")
    )


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Scale path — the vector×query product becomes a bucket-equi-join."""
    vb = signed_projection_buckets(vectors, vec_col=vec_col, id_col=id_col, n_planes=n_planes)
    qb = signed_projection_buckets(queries, vec_col=vec_col, id_col=query_id_col, n_planes=n_planes)
    v = vectors.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("vv")).join(
        vb.withColumnRenamed("vec_id", "neighbor_id"), on="neighbor_id"
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")).join(
        qb.withColumnRenamed("vec_id", "query_id"), on="query_id"
    )
    sim = (
        v.join(q, on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("vv"))
                / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("vv"), F.col("vv"))))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), "cosine")
    )
