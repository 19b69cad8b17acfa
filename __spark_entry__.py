"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship LWW-snapshot query on sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + training-data ops).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
hash-seeded / non-SQL-expressible operators, which pytest verifies instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ton_etl_spark.plans.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC last-writer-wins snapshot (the engine's core semantic)
    over the sf0.001 events table."""
    return QUERIES["cdc_lww_snapshot"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
