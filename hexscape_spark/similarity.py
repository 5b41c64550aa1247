"""Approximate-nearest-neighbour search over an embedding column.

Brute-force cosine top-k as the exact baseline (F.aggregate/zip_with dot
products — JVM-side, no Python), and a random-hyperplane-LSH bucketed
variant as the scale path: at 10^12 rows the cross join is impossible, but
bucketing on sign-bit sketches turns it into an equi-join whose buckets are
independently joinable (and AQE-splittable on skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_norm(df: DataFrame, vec: str = "embedding",
                   out: str = "unit_vec") -> DataFrame:
    n = _norm(F.col(vec))
    return df.withColumn(out, F.transform(F.col(vec), lambda v: v / n))


def cosine_topk_bruteforce(df: DataFrame, queries: DataFrame,
                           key: str = "vec_id", vec: str = "embedding",
                           k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbours of each query row (broadcast queries).

    Scale contract: |queries| small (broadcast), corpus arbitrarily large —
    one map-side join + per-query top-k (partial top-k map-side via the
    window after a (query_id)-shuffle of only candidate scores).
    """
    c = with_unit_norm(df, vec).select(F.col(key).alias("nn_id"),
                                       F.col("unit_vec").alias("cv"))
    q = with_unit_norm(queries, vec).select(F.col(key).alias("query_id"),
                                            F.col("unit_vec").alias("qv"))
    scored = (c.join(F.broadcast(q), F.col("nn_id") != F.col("query_id"))
              .withColumn("cosine", _dot(F.col("cv"), F.col("qv")))
              .select("query_id", "nn_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (LCG, no numpy on
    executors needed — computed driver-side as literals)."""
    vals = []
    state = (plane * 2654435761 + 17) % 2147483647
    for _ in range(dim):
        state = (state * 48271) % 2147483647
        vals.append(state / 2147483647.0 - 0.5)
    return vals


def with_lsh_bucket(df: DataFrame, vec: str = "embedding", planes: int = 12,
                    dim: int = 64, out: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane sign sketch -> integer bucket id."""
    acc = F.lit(0).cast("long")
    for p in range(planes):
        hp = _hyperplane(dim, p)
        dot = sum((F.element_at(F.col(vec), i + 1) * F.lit(hp[i])
                   for i in range(dim)), F.lit(0.0))
        acc = acc + F.when(dot > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out, acc)


def cosine_topk_lsh(df: DataFrame, key: str = "vec_id",
                    vec: str = "embedding", k: int = 5, planes: int = 8,
                    dim: int = 64) -> DataFrame:
    """ANN top-k: candidates restricted to the same LSH bucket.

    The self-join is an equi-join on bucket id — shuffle-partitioned by
    bucket, never a cross join.  Recall < 1.0 by construction; raise
    `planes` bands/rotations for higher recall (scale-tunable).
    """
    b = with_lsh_bucket(with_unit_norm(df, vec), "unit_vec", planes, dim)
    left = b.select(F.col(key).alias("query_id"), F.col("unit_vec").alias("qv"),
                    F.col("lsh_bucket"))
    right = b.select(F.col(key).alias("nn_id"), F.col("unit_vec").alias("cv"),
                     F.col("lsh_bucket"))
    scored = (left.join(right, on="lsh_bucket")
              .where(F.col("query_id") != F.col("nn_id"))
              .withColumn("cosine", _dot(F.col("cv"), F.col("qv")))
              .select("query_id", "nn_id", "cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
