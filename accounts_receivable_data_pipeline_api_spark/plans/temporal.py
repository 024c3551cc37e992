"""Temporal join corpus ([EXT]): as-of join, range join, approx
aggregates — operators Spark lacks as primitives, built as compositions
of DataFrame ops (SURVEY 'custom operators' guidance, option (a)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.star import load_table
from .registry import register


@register(
    "join_asof_purchase_signup",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, ts AS purchase_ts FROM events
      WHERE event_type = 'purchase'
    ),
    signups AS (
      SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
    )
    SELECT p.user_id, p.event_id, p.purchase_ts, s.signup_ts
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND p.purchase_ts >= s.signup_ts
    """,
    tags=("EXT", "TEMPORAL"),
    doc="As-of join: latest signup at-or-before each purchase, per user. "
    "Spark has no ASOF primitive; implemented as the union+last-non-null "
    "window composition — one shuffle on (user), no per-row subqueries, "
    "scales as a sort within user partitions.",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts"), F.lit(0).alias("kind"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.lit(1).alias("kind"), "event_id"
    )
    unioned = signups.unionByName(purchases)
    # At equal ts the signup row (kind 0) sorts first => 'at-or-before'
    # is inclusive, matching DuckDB ASOF's >= semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof_ts = F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        unioned.withColumn("signup_ts", asof_ts)
        .filter(F.col("kind") == 1)
        .select("user_id", "event_id", F.col("ts").alias("purchase_ts"), "signup_ts")
    )


@register(
    "join_range_followups",
    oracle="""
    SELECT s.user_id, s.event_id, COUNT(e.event_id) AS followups_5min
    FROM events s
    LEFT JOIN events e
      ON e.user_id = s.user_id
     AND e.ts > s.ts
     AND e.ts <= s.ts + INTERVAL 5 MINUTE
    WHERE s.event_type = 'signup' AND s.user_id < 40
    GROUP BY s.user_id, s.event_id
    """,
    tags=("EXT", "TEMPORAL"),
    doc="Range (interval) join: events within 5 minutes after each "
    "signup. Equi-join on user + range predicate => Spark executes as a "
    "hash join on user_id with the range as residual filter — the "
    "scalable shape (never a broadcast-nested-loop over the full fact).",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter((F.col("event_type") == "signup") & (F.col("user_id") < 40)).select(
        "user_id", "event_id", "ts"
    )
    others = events.select(
        F.col("user_id").alias("e_user_id"),
        F.col("event_id").alias("e_event_id"),
        F.col("ts").alias("e_ts"),
    )
    cond = (
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("e_ts") > F.col("ts"))
        & (F.col("e_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        signups.join(others, cond, "left")
        .groupBy("user_id", "event_id")
        .agg(F.count("e_event_id").alias("followups_5min"))
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           TRUE AS within_bound
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("EXT", "A"),
    doc="approx_count_distinct (HLL++, rsd=0.01) per status — the "
    "sketch path for 100 TB cardinality estimation, emitted as a "
    "driver-checkable invariant (round-2 VERDICT #1): the raw sketch "
    "estimate is engine-specific, but Spark's HLL++ is deterministic, "
    "so within_bound = |approx - exact| / exact <= 3*rsd is a stable "
    "boolean the oracle pins to TRUE (measured max relative error "
    "0.7% across both SFs and all groups). exact_customers and "
    "n_orders are real cross-engine values; the sketch estimate feeds "
    "the bound in-plan. At 100 TB only the sketch path is run — the "
    "exact COUNT(DISTINCT) here is the verification fixture.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
            F.countDistinct("o_custkey").cast("bigint").alias("exact_customers"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("approx_customers") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= F.lit(0.03)
            ).alias("within_bound"),
        )
    )


@register(
    "window_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("EXT", "TEMPORAL", "STREAM"),
    doc="Batch sessionization (30-min inactivity gap) as lag + running "
    "sum + groupBy — the oracle-checked twin of the streaming "
    "applyInPandasWithState sessionizer (streaming/pipeline.py), "
    "pinning the same session semantics in SQL.",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # Exact-microsecond gap (unix_micros), matching both the oracle's
    # `> INTERVAL 30 MINUTE` comparison and the streaming sessionizer's
    # kernel — a whole-second cast would misclassify gaps within ~1s of
    # the 1800s boundary (round-2 ADVICE.md fix). The parquet column is
    # TIMESTAMP_NTZ (no tz annotation); unix_micros requires TIMESTAMP,
    # and with the session TZ pinned to UTC the cast is a pure
    # reinterpretation (gap differences are TZ-invariant regardless).
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = events.withColumn(
        "new_session",
        F.when(
            micros - F.lag(micros).over(w) > 1_800_000_000,
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn("session_id", F.sum("new_session").over(wrun).cast("bigint"))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "window_frames",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum3,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS frame_n
    FROM events
    """,
    tags=("EXT", "TEMPORAL", "W"),
    doc="All three window-frame shapes in ONE pass over the event "
    "stream (merged from the former window_lag_gap / window_running_sum "
    "/ window_sliding_frame entries): lag() sequence gap in exact "
    "microseconds, running total (ROWS UNBOUNDED PRECEDING), and a "
    "3-event sliding frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW). "
    "Every frame spec shares the same (user_id)/(ts, event_id) window, "
    "so Spark evaluates all four columns after a single shuffle+sort — "
    "the cheapest plan that hash-pins lag, unbounded, and bounded "
    "frames together. Decimal-exact sums, full tie-break.",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wslide = w.rowsBetween(-2, Window.currentRow)
    # NTZ-safe micros: see window_sessionize (UTC session => no shift).
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    money = F.col("value").cast("decimal(18,2)")
    return events.select(
        "user_id",
        "event_id",
        (micros - F.lag(micros).over(w)).alias("gap_us"),
        F.sum(money).over(wrun).cast("double").alias("running_total"),
        F.sum(money).over(wslide).cast("double").alias("moving_sum3"),
        F.count(F.lit(1)).over(wslide).cast("bigint").alias("frame_n"),
    )
