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


def point_lookup(spark: SparkSession, table: str, key: str, value) -> DataFrame:
    """Index-like point lookup on a bucketed table — the 100 TB answer
    to the reference's UNIQUE b-tree index (SURVEY §4: Spark has no
    secondary index; the layout IS the index). An equality predicate on
    the bucket key prunes the scan to ONE bucket before any I/O — the
    executed plan shows ``SelectedBucketsCount: 1 out of N`` (asserted
    in tests) — and within the bucket the sortBy(key) layout gives the
    parquet reader tight row-group min/max stats, so the pushed filter
    skips row groups too. Lookup cost is O(bucket), independent of
    table size as buckets scale with data.

    Requires ``spark.sql.sources.bucketing.autoBucketedScan.enabled``
    = false WHILE THIS LOOKUP PLANS: the auto heuristic disables
    bucketed reading for scans with no join/agg (it optimizes for full
    scan parallelism), which also forfeits bucket pruning — exactly
    backwards for a point lookup. Because Spark reads the conf at
    physical-planning time (lazily, at the first action), the flag is
    flipped here, the physical plan is forced to materialize — it is
    then cached in this DataFrame's QueryExecution, so later actions
    reuse it — and the previous value is restored, leaving every OTHER
    query's plans untouched (a session-wide flip changed plans for
    unrelated scans as a read-path side effect).

    NOT THREAD-SAFE: the set -> force-plan -> restore window is
    session-wide, so a query planned CONCURRENTLY in another thread of
    the same SparkSession during that window silently loses auto
    bucketed-scan; restoring also re-sets an inherited default as an
    explicit session value when the key was set at a parent level.
    Fine for the single-threaded serving path this backs (the stdlib
    HTTP adapter handles one request at a time); a multi-threaded
    caller should serialize point lookups or give each thread its own
    ``spark.newSession()`` (independent conf, shared tables/cache).
    """
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "false")
    try:
        df = spark.table(table).filter(spark.table(table)[key] == value)
        df._jdf.queryExecution().executedPlan()  # pin the pruned plan
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    return df
