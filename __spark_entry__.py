"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship Loading pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator inventory
(SURVEY.md §2) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datacamp_etl_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the Phase-0 Loading slice (SURVEY §7) on sf0.001 —
    mapped append (K1, all five P1 value kinds) + finalize (K4)."""
    return QUERIES["mapped_append"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
