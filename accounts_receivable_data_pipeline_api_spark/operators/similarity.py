"""Similarity search over embedding columns ([EXT] north star).

Two paths:
  brute_force_topk — exact cosine top-k: cross join queries x candidates
                     with the dot product as a JVM fold (F.aggregate
                     over zip_with) and grouped top-k via row_number.
                     The baseline; exact, O(|Q| * |C|).
  lsh_topk         — random-hyperplane LSH bucketing: candidates are
                     restricted to vectors sharing a hash bucket with
                     the query, then exact-scored. The 100 TB path:
                     bucket join replaces the cross join.

Determinism: dot products fold in index order (IEEE doubles, fixed
order => bit-stable); hyperplanes derive from xxhash64(plane, dim), not
an RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold over zip_with products — index order, bit-stable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, match_id, score, rank), rank 1..k, score desc,
    ties broken by match_id (deterministic set under equal scores).

    Scale: queries side is broadcast (top-k search is always a small
    query set against a huge corpus); candidates stream through the
    scorer without shuffling until the grouped top-k, which AQE keeps
    partial: row_number over (query_id) after a repartition on query_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("match_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def hyperplane(dim: int, plane: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d is
    xxhash64(plane, d) scaled to [-1, 1). Content-independent and
    reproducible across runs/engines."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.xxhash64(F.lit(plane), d).cast("double") / F.lit(float(2**63))
        ),
    )


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Random-hyperplane signature: bit p = sign(vec . plane_p),
    packed into a long."""
    acc = F.lit(0).cast("long")
    for p in range(num_planes):
        bit = F.when(dot(vec, hyperplane(dim, p)) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc + F.shiftleft(bit, p)
    return acc


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: exact scoring restricted to candidates
    in the query's hyperplane bucket.

    At 8 planes / 256 buckets this cuts the scored set ~256x; recall is
    whatever falls in-bucket (standard SimHash-LSH tradeoff). The
    bucket equi-join replaces brute force's cross join — this is the
    shape that survives a 100 TB corpus.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), dim, num_planes))
    c = candidates.select(
        F.col(id_col).alias("match_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), dim, num_planes))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", cosine(F.col("qv"), F.col("cv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )
