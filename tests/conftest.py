from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("EEL_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from energy_emissions_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="eel-tests", cpus=4, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    from energy_emissions_lakehouse_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
