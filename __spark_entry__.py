"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator corpus declared in
``accounts_receivable_data_pipeline_api_spark.plans`` (one entry per
SURVEY §2 operator row; every entry carries a DuckDB oracle —
hash-family operators through driver-checkable invariant summaries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from accounts_receivable_data_pipeline_api_spark.plans import CORPUS, DRIVER_WINDOW
from accounts_receivable_data_pipeline_api_spark.session import configure_session

# Unconditional twin of the package-level corpus-window assert: the
# SPARK_GRAFT_CORPUS_WIP escape hatch exists for dev check scripts, and
# if that variable ever leaked into the driver's environment a mis-sized
# corpus would otherwise run silently (entries beyond the window get no
# correctness row). A real `raise`, not `assert` — asserts are stripped
# under python -O/PYTHONOPTIMIZE, which is exactly the silent-relaxation
# scenario this guard closes.
if len(CORPUS) != DRIVER_WINDOW:
    raise RuntimeError(
        f"driver entry point requires exactly {DRIVER_WINDOW} corpus entries; "
        f"found {len(CORPUS)}"
    )

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_session(spark)
    return CORPUS["tpch_q1_pricing_summary"].build(spark, SMOKE_SF_DIR)


def _wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
    builder = CORPUS[name].build

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        configure_session(spark)
        return builder(spark, sf_dir)

    run.__name__ = name
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(name) for name in CORPUS}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (None-oracle entries omitted)."""
    return {name: cq.oracle for name, cq in CORPUS.items() if cq.oracle is not None}
