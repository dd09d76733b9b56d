"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``titan_spark`` package; the catalog
(titan_spark/plans/catalog.py) maps operator names from SURVEY.md §2
to (Spark plan, oracle SQL) pairs.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module from any cwd — make the repo root
# importable so `titan_spark` resolves
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from titan_spark.plans.catalog import ORACLE_SQL, QUERIES, entry_query  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_query(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omissions =
    non-SQL-expressible ops, driver records rows-only check)."""
    return dict(ORACLE_SQL)
