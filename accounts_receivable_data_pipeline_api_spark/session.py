"""Shared SparkSession factory with pinned, scale-aware configuration.

The reference creates a new DB engine per request
(/root/reference/app/db/engine.py:8-10); here a single long-lived
SparkSession is shared by every job and every REST request. Confs are
pinned so that query semantics (timezone, decimal arithmetic, datetime
parsing) are deterministic and identical between local test runs and a
large cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that define SEMANTICS — identical on any cluster size.
SEMANTIC_CONFS: dict[str, str] = {
    # All date/timestamp literals and functions resolve in UTC; the REST
    # layer resolves "today in America/New_York" before the plan is built
    # (SURVEY F6), so no TZ logic lives inside Catalyst expressions.
    "spark.sql.session.timeZone": "UTC",
    # Exact decimal arithmetic: never silently fall back to double.
    "spark.sql.decimalOperations.allowPrecisionLoss": "false",
    # Proleptic Gregorian parser, strict patterns (SURVEY F8 / hard part 3).
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Arrow for any pandas_udf / toPandas path (similarity, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS); Spark 4 has
    # no nanos timestamp type, so read as long and convert at the
    # source (sources/star.py converts ns -> microsecond timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Confs that define PERFORMANCE POLICY — values below are the local-mode
# defaults; on a real cluster the same keys are set by deploy config.
ADAPTIVE_CONFS: dict[str, str] = {
    # AQE: runtime shuffle-partition coalescing, skew-join splitting,
    # dynamic broadcast conversion — the backbone of the 100 TB story.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Partition-count ceiling pre-AQE. local[32] tests use 32; a
    # 1000-executor cluster would set ~2-3x total cores. AQE coalesces
    # down, so erring high is safe.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    # Keep scan partitions at a size that fits executor memory with room
    # for shuffle buffers (default 128m is right for 100 TB parquet too).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Dims (nation/region/customer at small SF; customers dim in the AR
    # pipeline) auto-broadcast under this threshold; joins also carry
    # explicit broadcast() hints where the dim is known-small by design.
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    # Unfiltered COUNT/MIN/MAX aggregates answer from parquet footer
    # statistics instead of scanning data — at 100 TB a bare count(*)
    # (A1-style stats endpoints) becomes a metadata-only read. Off by
    # default upstream; values are identical either way (stats are
    # exact), so this is purely a scan-elision policy.
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime bloom-filter and dynamic-partition-pruning join filters
    # are ON by Spark 4 default — noted here because the 100 TB
    # fact-fact joins (tpch_q3/q5 shapes) rely on them; do not disable.
}


def get_spark(app_name: str = "accounts_receivable_data_pipeline_api_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for tests/bench;
    on a cluster the submitter sets master and this arg stays None with
    spark.master already configured.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    for key, value in {**SEMANTIC_CONFS, **ADAPTIVE_CONFS}.items():
        builder = builder.config(key, value)
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    builder = builder.config("spark.ui.enabled", "false")
    # Managed-table warehouse (bucketed tables) outside the repo tree.
    builder = builder.config(
        "spark.sql.warehouse.dir",
        os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
    )
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Pin semantic confs on an externally-provided session (the driver
    harness passes its own SparkSession to ``__spark_entry__.entry``)."""
    for key, value in SEMANTIC_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on a running session; defaults still correct
    for key in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions"):
        spark.conf.set(key, ADAPTIVE_CONFS[key])
    return spark
