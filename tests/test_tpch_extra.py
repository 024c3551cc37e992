"""Extra TPC-H-shape queries oracle-compared against DuckDB, OUTSIDE
the 50-entry driver corpus (the corpus window is full; these widen the
verified SQL surface without reshaping it). Q6, Q7, Q8, Q10, Q13, Q14,
Q15, and Q18 are expressible on this driver's reduced schemas directly
(with nationkey/p_type literals standing in for the spec's name
strings). Round 12 adds the remaining SHAPES as adapted queries — Q4
(EXISTS semi-join), Q9 (LIKE snowflake profit), Q11 (global-scalar
HAVING), Q16 (distinct-count agg), Q17 (correlated per-group average),
Q19 (disjunctive join predicate), Q21 (double EXISTS/NOT-EXISTS
self-join), Q22 (anti-join + scalar threshold) — each substituting
driver columns for the ones it omits (partsupp, l_shipmode,
l_commitdate, l_receiptdate, l_shipinstruct, p_container, c_phone,
o_comment; noted per test). Q2 and Q20 — structurally ABOUT
partsupp — run over a DERIVED partsupp both engines build identically
from lineitem (see the bottom section), and Q12's
conditional-count-per-group shape is also covered by
agg_cube_status_priority's row groups. All 22 TPC-H shapes oracled.

Decimal discipline follows the tpch_q1 entry (plans/relational.py):
money flows through DECIMAL casts (exact, order-free sums), final
columns convert to DOUBLE, and the DuckDB side converts
DECIMAL->DOUBLE through VARCHAR (DuckDB's direct cast is off by one
ulp past 2^53 — see the q1 oracle comment).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
from tests.conftest import ORACLE_SF_DIR
from tests.oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(ORACLE_SF_DIR)
    yield con
    con.close()


def _money(col: str):
    return F.col(col).cast("decimal(18,2)")


def _assert_match(rep):
    assert rep["count_match"] and rep["cols_match"] and rep["values_match"], rep


def test_q6_forecast_revenue_change(spark, duck):
    """Q6 shape: single-table filter + global agg — the purest
    predicate-pushdown query. Revenue as an exact decimal sum; the
    discount band compares DECIMALS (0.05/0.07 are not exact doubles,
    so a double BETWEEN would be engine-dependent at the boundary)."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    disc = _money("l_discount")
    df = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (disc >= F.lit("0.05").cast("decimal(18,2)"))
            & (disc <= F.lit("0.07").cast("decimal(18,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((_money("l_extendedprice") * disc).cast("decimal(24,4)"))
            .cast("double")
            .alias("revenue")
        )
    )
    _assert_match(
        compare(
            df,
            duck,
            """
            SELECT CAST(CAST(SUM(CAST(
                     CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(24,4)))
                   AS VARCHAR) AS DOUBLE) AS revenue
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
              AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
            """,
        )
    )
    # the window must actually select rows: a NULL revenue means the
    # comparison was vacuous (both engines aggregating an empty set)
    assert df.collect()[0]["revenue"] is not None


def test_q14_promo_revenue_share(spark, duck):
    """Q14 shape: fact-dim join + conditional aggregate ratio. Both
    sums are exact decimals; the final share is the raw IEEE quotient
    of their double conversions times a double literal — identical
    operands, identical result, never re-rounded."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    disc_price = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    joined = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1995-10-01").cast("date"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(
        F.lit("0").cast("decimal(24,4)")
    )
    df = joined.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(disc_price).cast("double")
        ).alias("promo_revenue_pct")
    )
    _assert_match(
        compare(
            df,
            duck,
            """
            WITH j AS (
              SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                       AS DECIMAL(24,4)) AS disc_price,
                     p_type
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE CAST(l_shipdate AS DATE) >= DATE '1995-09-01'
                AND CAST(l_shipdate AS DATE) < DATE '1995-10-01'
            )
            SELECT 100.0
                   * CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN disc_price
                                        ELSE CAST(0 AS DECIMAL(24,4)) END)
                          AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(SUM(disc_price) AS VARCHAR) AS DOUBLE)
                   AS promo_revenue_pct
            FROM j
            """,
        )
    )


def test_q18_large_volume_customers(spark, duck):
    """Q18 shape: groupBy-HAVING semi-join back into a 3-table join +
    top-k. The HAVING subquery becomes a left-semi join on the order
    key; the top-100 has a total tie-break (totalprice desc, orderkey)
    so the selected SET is unique."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    customer = load_table(spark, ORACLE_SF_DIR, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    qty = (
        li.join(big, "l_orderkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.sum(_money("l_quantity")).cast("double").alias("total_qty"))
    )
    df = (
        qty.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
    rep = compare(
        df,
        duck,
        """
        WITH big AS (
          SELECT l_orderkey
          FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        ),
        qty AS (
          SELECT l_orderkey,
                 CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                      AS DOUBLE) AS total_qty
          FROM lineitem
          WHERE l_orderkey IN (SELECT l_orderkey FROM big)
          GROUP BY l_orderkey
        )
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate,
               o_totalprice, total_qty
        FROM qty
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] > 0  # threshold must actually select orders


def test_q7_volume_shipping(spark, duck):
    """Q7 shape: double-dim join chain (lineitem->supplier->nation,
    order->customer->nation) with a symmetric nation-pair predicate and
    a year extraction group key. Nation keys 1/2 stand in for the
    standard FRANCE/GERMANY literals (the driver's nation names are not
    contractual)."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    customer = load_table(spark, ORACLE_SF_DIR, "customer")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    disc_price = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    df = (
        li.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2)
                | (F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1)
            )
            & (F.col("l_shipdate").cast("date") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") <= F.lit("1996-12-31").cast("date"))
        )
        .groupBy(
            F.col("s_nationkey").alias("supp_nation"),
            F.col("c_nationkey").alias("cust_nation"),
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )
    _assert_match(
        compare(
            df,
            duck,
            """
            SELECT s_nationkey AS supp_nation, c_nationkey AS cust_nation,
                   CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
                   CAST(CAST(SUM(CAST(
                     CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                     AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS revenue
            FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
            WHERE ((s_nationkey = 1 AND c_nationkey = 2)
                   OR (s_nationkey = 2 AND c_nationkey = 1))
              AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01'
                                               AND DATE '1996-12-31'
            GROUP BY 1, 2, 3
            """,
        )
    )


def test_q10_returned_item_reporting(spark, duck):
    """Q10 shape: returned-revenue top-20 customers — fact filter on
    the return flag, quarter window on the order date, 3-dim join,
    tie-broken top-k."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    customer = load_table(spark, ORACLE_SF_DIR, "customer")
    nation = load_table(spark, ORACLE_SF_DIR, "nation")
    disc_price = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    df = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate").cast("date") >= F.lit("1995-10-01").cast("date"))
                & (F.col("o_orderdate").cast("date") < F.lit("1996-01-01").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
    _assert_match(
        compare(
            df,
            duck,
            """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(CAST(SUM(CAST(
                     CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                     AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS revenue
            FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND CAST(o_orderdate AS DATE) >= DATE '1995-10-01'
              AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
            """,
        )
    )
    assert df.count() > 0  # the quarter must select orders


def test_q13_customer_order_distribution(spark, duck):
    """Q13 shape: left outer join preserving zero-order customers, then
    a distribution over the grouped counts (two stacked aggregations)."""
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    customer = load_table(spark, ORACLE_SF_DIR, "customer")
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    df = (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )
    _assert_match(
        compare(
            df,
            duck,
            """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey
            )
            GROUP BY c_count
            """,
        )
    )


def test_q15_top_supplier(spark, duck):
    """Q15 shape: a revenue view reused twice — once aggregated to its
    MAX, once filtered to the suppliers achieving it. The max
    comparison happens on the EXACT decimal sums (comparing after a
    double conversion could admit a false tie one ulp apart); only the
    output column converts to double."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    disc_price = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    revenue = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(disc_price).alias("__rev"))
    )
    top = revenue.agg(F.max("__rev").alias("__max"))
    df = (
        revenue.join(F.broadcast(top), F.col("__rev") == F.col("__max"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )
    rep = compare(
        df,
        duck,
        """
        WITH revenue AS (
          SELECT l_suppkey,
                 SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                     AS DECIMAL(24,4))) AS rev
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev = (SELECT MAX(rev) FROM revenue)
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] >= 1


def test_q8_national_market_share(spark, duck):
    """Q8 shape: 6-table snowflake (lineitem-part-supplier,
    orders-customer-nation-region) + a conditional share ratio per
    order year. Nation key 1's share within region 1 for p_type
    'PROMO' stands in for the standard BRAZIL/AMERICA/steel literals.
    Both the numerator and denominator are exact decimal sums; the
    share is their raw IEEE double quotient."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    customer = load_table(spark, ORACLE_SF_DIR, "customer")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    nation = load_table(spark, ORACLE_SF_DIR, "nation")
    vol = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    df = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate").cast("date") >= F.lit("1995-01-01").cast("date"))
                & (F.col("o_orderdate").cast("date") <= F.lit("1996-12-31").cast("date"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 1)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("s_nationkey") == 1, vol).otherwise(
                    F.lit("0").cast("decimal(24,4)")
                )).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )
    rep = compare(
        df,
        duck,
        """
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(CAST(SUM(CASE WHEN s_nationkey = 1 THEN vol
                                  ELSE CAST(0 AS DECIMAL(24,4)) END)
                    AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS mkt_share
        FROM (
          SELECT o_orderdate, s_nationkey,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                   AS DECIMAL(24,4)) AS vol
          FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
          WHERE p_type = 'PROMO'
            AND n_regionkey = 1
            AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01'
                                              AND DATE '1996-12-31'
        )
        GROUP BY 1
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] >= 2  # both order years present


# ---------------------------------------------------------------------------
# Round 12: the remaining TPC-H SHAPES, adapted to the driver's reduced
# schemas. Q2 and Q20 genuinely need partsupp (no adaptation preserves
# their shape); the eight below keep each query's distinguishing plan
# shape — EXISTS semi-join, global-scalar HAVING, distinct-count agg,
# correlated per-group average, disjunctive join predicate, double
# EXISTS/NOT-EXISTS self-join, anti-join + scalar threshold — with the
# driver's columns standing in for the missing ones (noted per test).
# Comparisons avoid cross-engine float traps: thresholds against
# averages are rewritten as exact integer/decimal cross-multiplications
# (qty * 5 * count < sum instead of qty < 0.2 * avg), so no boundary
# row can flip on a 1-ulp avg difference.
# ---------------------------------------------------------------------------


def test_q4_order_priority_exists(spark, duck):
    """Q4 shape: per-priority order counts gated by an EXISTS
    subquery -> left-semi join (l_returnflag = 'R' stands in for the
    missing l_commitdate < l_receiptdate)."""
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    df = (
        orders.filter(
            (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
        )
        .join(
            li.filter(F.col("l_returnflag") == "R").select(
                F.col("l_orderkey").alias("o_orderkey")
            ),
            "o_orderkey",
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )
    rep = compare(
        df,
        duck,
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY 1
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] == 5  # all five priorities present


def test_q9_product_type_profit(spark, duck):
    """Q9 shape: name-LIKE part filter through a 4-table join, profit
    grouped by (supplier nation, order year). The driver has no
    partsupp, so profit = revenue (ps_supplycost's subtraction is the
    one piece that cannot be adapted); the plan shape — LIKE pushdown,
    snowflake join, two-key group — is Q9's."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    nation = load_table(spark, ORACLE_SF_DIR, "nation")
    disc_price = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    df = (
        li.join(
            F.broadcast(part.filter(F.col("p_name").contains("red"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(F.sum(disc_price).cast("double").alias("sum_profit"))
    )
    rep = compare(
        df,
        duck,
        """
        SELECT n_name AS nation,
               CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               CAST(CAST(SUM(CAST(
                 CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                 AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS sum_profit
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] > 10


def test_q11_supplier_value_share(spark, duck):
    """Q11 shape: per-key value with a HAVING against a fraction of
    the GLOBAL sum (scalar subquery -> broadcast cross join). Supplier
    lineitem revenue stands in for partsupp stock value. The threshold
    fraction is 1/n_suppliers — share strictly above the GLOBAL MEAN —
    so it is fixture-independent (round-12 ADVICE: the old fixed 1.05%
    sat 0.07pp under the fixture's max share and a regenerated skew
    could have selected all or zero suppliers): for ANY revenue
    distribution short of perfect uniformity, at least one supplier
    sits above the mean and at least one below, so the both-directions
    selectivity assert can never flip on fixture skew. The comparison
    cross-multiplies exact decimals by the integer supplier count
    (value * n > total), so no boundary supplier can flip on a float
    rounding difference."""
    n_suppliers = load_table(spark, ORACLE_SF_DIR, "supplier").count()
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    disc_price = (
        _money("l_extendedprice")
        * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
    ).cast("decimal(24,4)")
    rev = li.groupBy("l_suppkey").agg(F.sum(disc_price).alias("__v"))
    total = rev.agg(F.sum("__v").alias("__t"))
    df = (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("__v") * n_suppliers > F.col("__t"))
        .select("l_suppkey", F.col("__v").cast("double").alias("value"))
    )
    rep = compare(
        df,
        duck,
        f"""
        WITH rev AS (
          SELECT l_suppkey,
                 SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                     AS DECIMAL(24,4))) AS v
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT l_suppkey, CAST(CAST(v AS VARCHAR) AS DOUBLE) AS value
        FROM rev
        WHERE v * {n_suppliers} > (SELECT SUM(v) FROM rev)
        """,
    )
    _assert_match(rep)
    # the threshold must be selective in BOTH directions (guaranteed
    # above for any non-perfectly-uniform fixture)
    assert 0 < rep["spark_rows"] < n_suppliers, rep


def test_q16_supplier_count_by_part(spark, duck):
    """Q16 shape: COUNT(DISTINCT supplier) per part attribute group
    with exclusion filters (brand <>, size IN); lineitem's suppliers
    stand in for partsupp's."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    df = (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#13")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )
    rep = compare(
        df,
        duck,
        """
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#13' AND p_size IN (1, 5, 10, 15, 20, 25)
        GROUP BY 1, 2, 3
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] > 20


def test_q17_small_quantity_revenue(spark, duck):
    """Q17 shape: revenue from lineitems below 20% of their part's
    average quantity — the correlated per-part AVG subquery, as a
    group + join-back. The threshold is the exact cross-multiplied
    form qty * 5 * count < sum (decimals and integers only): a literal
    0.2 * AVG would compare doubles whose low bits differ by engine
    summation order. p_brand stands in for the missing p_container."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    brand = li.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#12")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_part = brand.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.sum(_money("l_quantity")).alias("__qsum"),
        F.count(F.lit(1)).alias("__qcnt"),
    )
    df = (
        brand.join(F.broadcast(per_part), F.col("p_partkey") == F.col("__pk"))
        .filter(_money("l_quantity") * 5 * F.col("__qcnt") < F.col("__qsum"))
        .agg(
            (F.sum(_money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )
    rep = compare(
        df,
        duck,
        """
        WITH brand AS (
          SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS price
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#12'
        ),
        per_part AS (
          SELECT l_partkey AS pk, SUM(qty) AS qsum,
                 CAST(COUNT(*) AS BIGINT) AS qcnt
          FROM brand GROUP BY 1
        )
        SELECT CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) / 7.0 AS avg_yearly
        FROM brand JOIN per_part ON l_partkey = pk
        WHERE qty * 5 * qcnt < qsum
        """,
    )
    _assert_match(rep)
    assert df.collect()[0]["avg_yearly"] is not None


def test_q19_disjunctive_predicate_revenue(spark, duck):
    """Q19 shape: a three-way DISJUNCTION of conjunctive (brand, size,
    quantity) bands across a join — the classic test of OR-predicate
    handling (each disjunct must still prune; none may leak across).
    Brand/size/quantity bands stand in for the container/shipmode
    terms the driver omits."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    qty = _money("l_quantity")
    df = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("p_size").between(1, 5)
                & qty.between(1, 11)
            )
            | (
                (F.col("p_brand") == "Brand#14")
                & F.col("p_size").between(1, 10)
                & qty.between(10, 20)
            )
            | (
                (F.col("p_brand") == "Brand#15")
                & F.col("p_size").between(1, 15)
                & qty.between(20, 30)
            )
        )
        .agg(
            F.sum(
                (
                    _money("l_extendedprice")
                    * (F.lit(1) - _money("l_discount")).cast("decimal(4,2)")
                ).cast("decimal(24,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )
    rep = compare(
        df,
        duck,
        """
        SELECT CAST(CAST(SUM(CAST(
                 CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(4,2))
                 AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
               AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
               AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 20 AND 30)
        """,
    )
    _assert_match(rep)
    assert df.collect()[0]["revenue"] is not None


def test_q21_sole_failing_supplier(spark, duck):
    """Q21 shape: the double correlated EXISTS / NOT-EXISTS self-join —
    suppliers whose lineitem is the ONLY returned one in a multi-
    supplier order (l_returnflag = 'R' stands in for the receipt-after-
    commit lateness predicate). The Spark side proves the aggregate
    reformulation: per-order distinct-supplier stats replace both
    correlated subqueries (another supplier EXISTS <=> n_supp > 1; no
    OTHER returning supplier <=> n_ret == 1, since the probe row itself
    returns), and the DuckDB oracle runs the literal EXISTS/NOT EXISTS
    form, so the hash equality is a cross-engine proof the two
    formulations agree row-for-row."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    stats = li.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("__n_ret"),
    )
    df = (
        li.filter(F.col("l_returnflag") == "R")
        .join(stats, F.col("l_orderkey") == F.col("__ok"))
        .filter((F.col("__n_supp") > 1) & (F.col("__n_ret") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
    rep = compare(
        df,
        duck,
        """
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] > 0


def test_q22_dormant_customer_balance(spark, duck):
    """Q22 shape: customers above a global positive-balance average
    (scalar subquery) with NO recent orders (anti-join), grouped by
    country. c_nationkey IN-list stands in for the phone-prefix
    country codes; 'no orders since 1999' stands in for 'no orders
    ever' (every driver customer has orders). The average threshold is
    the exact cross-multiplied form bal * count > sum."""
    customer = load_table(spark, ORACLE_SF_DIR, "customer")
    orders = load_table(spark, ORACLE_SF_DIR, "orders")
    nats = [1, 3, 5, 7, 9, 11, 13]
    in_scope = customer.filter(F.col("c_nationkey").isin(nats))
    pos = in_scope.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_money("c_acctbal")).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    recent = orders.filter(
        F.col("o_orderdate").cast("date") >= F.lit("1999-01-01").cast("date")
    ).select(F.col("o_custkey").alias("c_custkey"))
    df = (
        in_scope.crossJoin(F.broadcast(pos))
        .filter(_money("c_acctbal") * F.col("__c") > F.col("__s"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(_money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
    rep = compare(
        df,
        duck,
        """
        WITH scope AS (
          SELECT c_custkey, c_nationkey,
                 CAST(c_acctbal AS DECIMAL(18,2)) AS bal
          FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        ),
        pos AS (
          SELECT SUM(bal) AS s, CAST(COUNT(*) AS BIGINT) AS c
          FROM scope WHERE bal > 0
        )
        SELECT c_nationkey AS cntrycode,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(CAST(SUM(bal) AS VARCHAR) AS DOUBLE) AS totacctbal
        FROM scope, pos
        WHERE bal * c > s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
        GROUP BY 1
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] > 0


# ---------------------------------------------------------------------------
# Q2 / Q20 — the two partsupp-bound shapes, over a DERIVED partsupp:
# both engines build the same supplier-part relation from lineitem
# (ps_cost = MIN extendedprice, pair_qty = SUM quantity — exact decimal
# aggregates), then run the spec's shape on it. This keeps the plan
# shapes the spec is ABOUT — Q2's correlated per-group MIN subquery
# re-join, Q20's nested aggregation + more-than-half threshold behind a
# double IN-subquery chain — while staying fully cross-engine-checkable
# on the driver's schemas. With these, all 22 TPC-H shapes are oracled.
# ---------------------------------------------------------------------------


def test_q2_min_cost_supplier(spark, duck):
    """Q2 shape: for each in-scope part, the supplier(s) achieving the
    MINIMUM cost within a region — the correlated MIN subquery, run as
    a groupBy + join-back on the Spark side and as the literal
    correlated subquery on the DuckDB side, so the hash equality
    proves the two formulations agree. Cost = MIN(l_extendedprice) per
    (part, supplier) derived from lineitem; scope = p_type 'PROMO',
    p_size <= 25, supplier nations in region 1. The min comparison
    happens on EXACT decimals."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    nation = load_table(spark, ORACLE_SF_DIR, "nation")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money("l_extendedprice")).alias("__cost")
    )
    scope = (
        ps.join(
            F.broadcast(
                part.filter((F.col("p_type") == "PROMO") & (F.col("p_size") <= 25))
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 1)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    min_cost = scope.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("__cost").alias("__min")
    )
    df = (
        scope.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("__pk")) & (F.col("__cost") == F.col("__min")),
        )
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_brand",
            F.col("__cost").cast("double").alias("supply_cost"),
        )
    )
    rep = compare(
        df,
        duck,
        """
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
          FROM lineitem GROUP BY 1, 2
        ),
        scope AS (
          SELECT p_partkey, p_brand, s_suppkey, s_acctbal, s_name,
                 n_name, cost
          FROM ps
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
          WHERE p_type = 'PROMO' AND p_size <= 25 AND n_regionkey = 1
        )
        SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_brand,
               CAST(CAST(cost AS VARCHAR) AS DOUBLE) AS supply_cost
        FROM scope s1
        WHERE cost = (SELECT MIN(cost) FROM scope s2
                      WHERE s2.p_partkey = s1.p_partkey)
        """,
    )
    _assert_match(rep)
    assert rep["spark_rows"] > 0


def test_q20_dominant_part_suppliers(spark, duck):
    """Q20 shape: the double IN-subquery chain over a nested
    aggregation with a more-than-half threshold — suppliers holding a
    DOMINANT share (pair qty * 2 > part's total qty, exact decimals)
    of some name-matched part's 1996 shipments, filtered to a nation
    band. pair_qty from lineitem stands in for ps_availqty; 'dominant
    share of the part's year volume' stands in for 'availqty > half
    the year's shipments'."""
    li = load_table(spark, ORACLE_SF_DIR, "lineitem")
    part = load_table(spark, ORACLE_SF_DIR, "part")
    supplier = load_table(spark, ORACLE_SF_DIR, "supplier")
    y96 = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    pair = y96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_money("l_quantity")).alias("__pq")
    )
    tot = pair.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("__pq").alias("__tot")
    )
    dominant = (
        pair.join(F.broadcast(tot), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("__pq") * 2 > F.col("__tot"))
        .join(
            F.broadcast(
                part.filter(F.col("p_name").contains("red")).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    df = (
        supplier.filter(F.col("s_nationkey") < 13)
        .join(dominant, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
    )
    rep = compare(
        df,
        duck,
        """
        WITH pair AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pq
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          GROUP BY 1, 2
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_nationkey < 13
          AND s_suppkey IN (
            SELECT l_suppkey FROM pair p1
            WHERE pq * 2 > (SELECT SUM(pq) FROM pair p2
                            WHERE p2.l_partkey = p1.l_partkey)
              AND l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE '%red%'))
        """,
    )
    _assert_match(rep)
    n_suppliers = supplier.count()
    assert 0 < rep["spark_rows"] < n_suppliers, rep
