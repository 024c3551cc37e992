from __future__ import annotations

import os

import pytest

# Test-session speedups — and a RECORD of which keys this file itself
# injected (vs deliberate user exports, which setdefault leaves alone):
# the bench-regression gate strips exactly the injected keys from its
# subprocess env so it measures the anchors' methodology, while a
# user's own SPARK_GRAFT_CPUS export survives into the gate's bench
# (sixth-pass round-12 review — an unconditional strip would invert
# the very anchor/gate mismatch the strip exists to fix).
TEST_INJECTED_ENV: list[str] = []
for _k, _v in (("SPARK_GRAFT_CPUS", "8"), ("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")):
    if _k not in os.environ:
        os.environ[_k] = _v
        TEST_INJECTED_ENV.append(_k)

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
