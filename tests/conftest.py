"""Shared fixtures: one SparkSession per test session, DuckDB with the
testdata tables registered as views (mirroring the driver's oracle setup).
"""

from __future__ import annotations

import duckdb
import pytest

from amazon_sales_data_engineering_spark.session import get_spark
from amazon_sales_data_engineering_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    s = get_spark(
        app_name="asde-tests",
        master="local[8]",
        conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": str(warehouse),
        },
    )
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
