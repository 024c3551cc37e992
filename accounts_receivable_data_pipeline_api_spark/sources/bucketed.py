"""Bucketed tables: co-located, shuffle-free joins ([EXT] scale utility).

At 100 TB the dominant cost of a fact-fact join (e.g. orders x
lineitem) is shuffling both sides on the join key for every query.
Bucketing pays that shuffle ONCE at write time: both tables are written
pre-hash-partitioned (and sorted) on the key into the same number of
buckets, and every subsequent join on that key is a zero-exchange
sort-merge join — each task reads bucket i of both sides.

Spark requires bucketed data to be catalog-managed (``saveAsTable``) so
the bucket spec travels with the table; the warehouse location is pinned
in session.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 8,
) -> None:
    """Write ``df`` as a managed parquet table bucketed + sorted by
    ``key``. Use the SAME ``num_buckets`` for every table that will join
    on ``key`` — equal bucket counts are what make the join co-located.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. With both
    sides bucketed, the physical plan has NO Exchange — verify with
    ``df.explain()`` (tests assert it).
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
