"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: one full scheduler round (canonicalize →
                dedup → robots → salted priority/budget cut) over a
                frontier derived from sf0.001 orders.
queries()     — every implemented operator from SURVEY.md §2 + the
                training-data-pipeline ops, on the driver tables.
oracle_sql()  — matching DuckDB ANSI SQL for each (all pairs are
                cross-checked in tests/test_oracle_pairs.py too).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cola_spark.flagship import flagship  # noqa: E402
from cola_spark.queries import PAIRS  # noqa: E402


def _ensure_shipped(spark: SparkSession) -> None:
    """Executor Python workers must import cola_spark inside pandas UDFs;
    if the driver built its own session (no addPyFile), ship the package
    zip once per session."""
    if not getattr(spark, "_cola_spark_shipped", False):
        try:
            from cola_spark.shipping import ship_package

            ship_package(spark)
        except Exception:
            pass  # already added, or local cwd import will cover it
        spark._cola_spark_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in PAIRS.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in PAIRS.items() if sql is not None}
