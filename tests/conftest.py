from __future__ import annotations

import duckdb
import pytest

from e_commerce_data_lakehouse_spark.catalog import TESTDATA_TABLES
from e_commerce_data_lakehouse_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_SMALL}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_oracle():
    """DuckDB views at sf0.01 — the scale the driver's t2 gate uses."""
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_ORACLE}/{name}.parquet')"
        )
    yield con
    con.close()
