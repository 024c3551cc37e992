"""Funnel + retention oracle comparison against DuckDB on the real
events table, plus constructed-input edge semantics."""

from __future__ import annotations

import pytest

from accounts_receivable_data_pipeline_api_spark.operators import events as ev_ops
from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
from tests.conftest import ORACLE_SF_DIR
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(ORACLE_SF_DIR)
    yield con
    con.close()


def test_funnel_matches_oracle(spark, duck):
    ev = load_table(spark, ORACLE_SF_DIR, "events")
    df = ev_ops.funnel(ev, ["view", "click", "purchase"])
    rep = compare(
        df,
        duck,
        """
        WITH t0 AS (
          SELECT user_id, MIN(ts) AS thr FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        t1 AS (
          SELECT e.user_id, MIN(e.ts) AS thr
          FROM events e JOIN t0 ON e.user_id = t0.user_id
          WHERE e.event_type = 'click' AND e.ts > t0.thr
          GROUP BY e.user_id
        ),
        t2 AS (
          SELECT e.user_id, MIN(e.ts) AS thr
          FROM events e JOIN t1 ON e.user_id = t1.user_id
          WHERE e.event_type = 'purchase' AND e.ts > t1.thr
          GROUP BY e.user_id
        )
        SELECT CAST(0 AS INT) AS step, 'view' AS step_name,
               CAST((SELECT COUNT(*) FROM t0) AS BIGINT) AS n_users
        UNION ALL
        SELECT CAST(1 AS INT), 'click', CAST((SELECT COUNT(*) FROM t1) AS BIGINT)
        UNION ALL
        SELECT CAST(2 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
        """,
    )
    assert rep["count_match"] and rep["cols_match"] and rep["values_match"], rep
    counts = {r["step"]: r["n_users"] for r in df.collect()}
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[0] > 0


def test_retention_matches_oracle(spark, duck):
    ev = load_table(spark, ORACLE_SF_DIR, "events")
    df = ev_ops.retention_cohorts(ev)
    rep = compare(
        df,
        duck,
        """
        WITH e AS (
          SELECT user_id AS u, CAST(ts AS DATE) AS d FROM events
        ),
        first AS (
          SELECT u, MIN(d) AS cohort_day FROM e GROUP BY u
        ),
        weekly AS (
          SELECT DISTINCT e.u,
                 CAST(floor(datediff('day', DATE '2024-01-01', f.cohort_day) / 7)
                      AS INT) AS cohort_week,
                 CAST(floor(datediff('day', f.cohort_day, e.d) / 7) AS INT)
                   AS week_idx
          FROM e JOIN first f ON e.u = f.u
        )
        SELECT cohort_week, week_idx, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM weekly GROUP BY cohort_week, week_idx
        """,
    )
    assert rep["count_match"] and rep["cols_match"] and rep["values_match"], rep
    # week 0 of each cohort is the cohort size: it must be the max of
    # its cohort's row counts
    rows = df.collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], {})[r["week_idx"]] = r["n_users"]
    for c, weeks in by_cohort.items():
        assert 0 in weeks
        assert weeks[0] == max(weeks.values())


def test_funnel_strict_order_excludes_ties_and_reversals(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view then click -> converts
        (1, "view", t),
        (1, "click", t + dt.timedelta(minutes=1)),
        # user 2: click BEFORE view -> does not convert
        (2, "click", t),
        (2, "view", t + dt.timedelta(minutes=1)),
        # user 3: view and click at the SAME timestamp -> tie, no order proof
        (3, "view", t),
        (3, "click", t),
        # user 4: view only
        (4, "view", t),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {r["step_name"]: r["n_users"] for r in ev_ops.funnel(df, ["view", "click"]).collect()}
    assert out == {"view": 4, "click": 1}


def test_funnel_and_retention_plan_shapes(spark):
    """Funnel stages must push their event-type equality into the
    parquet scan and join on equi keys only; retention is three bounded
    shuffles. A nested-loop/cartesian anywhere is a scale regression."""
    import re

    ev = load_table(spark, ORACLE_SF_DIR, "events")
    funnel_plan = None
    for name, df in (
        ("funnel", ev_ops.funnel(ev, ["view", "click", "purchase"])),
        ("retention", ev_ops.retention_cohorts(ev)),
    ):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        if name == "funnel":
            funnel_plan = plan
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", funnel_plan)
    assert any("event_type" in p for p in pushed), funnel_plan
