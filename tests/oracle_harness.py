"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a corpus query in Spark and its oracle SQL in DuckDB over the same
parquet tables, then compares row count + column names + values
(order-insensitive, columns sorted by name, floats to 9 significant
digits). Strict enough that a pass here predicts a driver hash-match.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from accounts_receivable_data_pipeline_api_spark.sources.star import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


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
    s = _normalize_rows(spark_cols, [tuple(r) for r in spark_rows])
    d = _normalize_rows(duck_cols, duck_rows)
    report["values_match"] = s == d
    if not report["values_match"]:
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                report["first_diff"] = {"row": i, "spark": a, "duck": b}
                break
        else:
            report["first_diff"] = {"row": min(len(s), len(d)), "note": "length mismatch"}
    return report
