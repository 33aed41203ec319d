from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacamp_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("datacamp-etl-spark-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture()
def manager(spark, tmp_path):
    from datacamp_etl_spark.jobs.manager import ETLManager

    mgr = ETLManager(spark, str(tmp_path))
    mgr.create_etl_manager_structures(force=True)
    return mgr


def load(spark, sf_dir: str, table: str):
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
