"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a corpus query in Spark and its oracle SQL in DuckDB over the same
parquet tables, then compares row count + column names + values
(order-insensitive, columns sorted by name).

Asymmetric decimal normalization — the part that makes this mirror
actually PREDICT the driver (round-2 finding): the driver renders the
DuckDB side's DECIMAL values scale-free (2494.00 -> "2494.0") while
Spark's collect preserves scale ("2494.00"). We reproduce that here:
Spark-side decimals normalize via str() (scale kept), DuckDB-side
decimals via str(float()) (scale dropped). A corpus query that emits a
decimal output column therefore fails here exactly when it would fail
the driver — which is why every corpus entry casts its final decimal
columns to DOUBLE. Floats compare by full shortest-roundtrip repr
(bit-identical or bust), not truncated significant digits.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os

import duckdb

from accounts_receivable_data_pipeline_api_spark.sources.star import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata is a single parquet file; Spark-written tables
        # (e.g. the synthesized /tmp/sf1) are directories of part files
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _norm(v, scale_free_decimals: bool):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # duck side: mirror the driver's scale-free decimal rendering
        return repr(float(v)) if scale_free_decimals else str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _normalize_rows(cols, rows, scale_free_decimals: bool):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i], scale_free_decimals) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> dict:
    spark_rows = spark_df.collect()
    spark_cols = spark_df.columns
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    report = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "count_match": len(spark_rows) == len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "values_match": False,
        "first_diff": None,
    }
    if not (report["count_match"] and report["cols_match"]):
        return report
    s = _normalize_rows(spark_cols, [tuple(r) for r in spark_rows], scale_free_decimals=False)
    d = _normalize_rows(duck_cols, duck_rows, scale_free_decimals=True)
    report["values_match"] = s == d
    if not report["values_match"]:
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                report["first_diff"] = {"row": i, "spark": a, "duck": b}
                break
        else:
            report["first_diff"] = {"row": min(len(s), len(d)), "note": "length mismatch"}
    return report
