from __future__ import annotations

import os

import pytest

# Test-session speedups. The bench-regression gate strips these two
# keys from its SUBPROCESS env unconditionally (test_bench_regression.
# _run_bench): BENCH_ANCHOR.json is a COMMITTED artifact recorded at
# bench.py's own defaults, so the gate must measure those defaults no
# matter where an ambient override came from — this conftest, a
# developer following the verify skill's startup tip, or a pytest-xdist
# controller (seventh-pass round-12 review: a record-what-we-injected
# scheme silently regressed to the 8-core-bench-vs-32-core-anchor
# mismatch whenever the key was already present).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")

from accounts_receivable_data_pipeline_api_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("accounts-receivable-data-pipeline-api-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
