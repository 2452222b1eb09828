from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from poc_parquet_publisher_spark.session import build_session

    spark = build_session(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck(request):
    from tests.oracle_harness import duckdb_connection

    con = duckdb_connection(SF_CORRECTNESS)
    yield con
    con.close()
