"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator catalog (SURVEY.md §2) for the
driver's DuckDB differential check at sf0.01. The catalog itself lives
in ``yelp_data_engineering_pipeline_spark.plans.catalog``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from yelp_data_engineering_pipeline_spark.plans import catalog
from yelp_data_engineering_pipeline_spark.plans.flagship import revenue_by_nation


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (same aliases)."""
    return catalog.oracle_sql()
