"""Event-stream analytics compositions: funnel conversion and cohort
retention — the two queries every product-analytics workload runs over
an events table ([EXT]; the reference has no event surface).

Both are pure DataFrame compositions (no UDFs) with engine-portable
semantics: stage boundaries are exact timestamp minima and week
indices are integer day-diffs divided by 7 — no date_trunc('week')
anywhere, because week-start conventions are the classic cross-engine
divergence and integer arithmetic has none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: for each step i, a user converts iff they have a
    step-i event strictly AFTER their earliest qualifying step-(i-1)
    event. Returns one row per step: (step INT, step_name, n_users
    BIGINT) with n_users non-increasing.

    Semantics: per user, t_0 = min ts of steps[0]; t_i = min ts of
    steps[i] with ts > t_{i-1}. The strict inequality means a
    same-timestamp pair does not convert (a tie cannot prove order).

    Plan shape at 100 TB: each stage re-scans the events source with
    its event-type equality PUSHED INTO the scan (so a stage reads only
    its own step's rows — gated in tests), aggregates a per-user min
    (map-side partial), and joins the previous stage's thresholds on
    the user key (broadcast once the funnel narrows, which it does by
    construction). len(steps) is small and fixed, so the funnel is
    len(steps) pushdown scans + len(steps) user-key shuffles — never a
    per-user event-list materialization.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    # t_0 per user (each stage filters to exactly its own step — the
    # equality is the predicate that reaches the scan)
    cur = (
        ev.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__thr"))
    )
    counts = [(0, steps[0], cur)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("__t") == step)
            .join(cur, "__u")
            .filter(F.col("__ts") > F.col("__thr"))
            .groupBy("__u")
            .agg(F.min("__ts").alias("__thr"))
        )
        counts.append((i, step, nxt))
        cur = nxt
    out = None
    for i, name, df in counts:
        row = df.agg(
            F.lit(i).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    epoch: str = "2024-01-01",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention matrix: cohort_week = the user's first
    activity week (7-day buckets counted from ``epoch``), week_idx =
    whole weeks between the user's cohort DAY and the activity day.
    Returns (cohort_week INT, week_idx INT, n_users BIGINT) — the
    count of cohort members active in that relative week (week_idx 0
    is the cohort week itself, so its n_users is the cohort size).

    Integer day-diffs only: floor(datediff / 7) is identical in every
    engine, unlike date_trunc('week') whose week start is a dialect
    convention.

    Plan shape at 100 TB: one per-user min (shuffle on user), one
    broadcast-or-hash join back, one distinct + count over (cohort,
    week, user) — three shuffles, all on bounded keys.
    """
    e = events.select(
        F.col(user_col).alias("__u"), F.col(ts_col).cast("date").alias("__d")
    )
    first = e.groupBy("__u").agg(F.min("__d").alias("__cohort_day"))
    ep = F.lit(epoch).cast("date")
    return (
        e.join(first, "__u")
        .select(
            "__u",
            F.floor(F.datediff(F.col("__cohort_day"), ep) / 7)
            .cast("int")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("__d"), F.col("__cohort_day")) / 7)
            .cast("int")
            .alias("week_idx"),
        )
        .distinct()
        .groupBy("cohort_week", "week_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
