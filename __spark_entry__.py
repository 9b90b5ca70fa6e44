"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse→route→aggregate over the
sf0.001 events log corpus. ``queries()``/``oracle_sql()`` expose the
full operator registry from ``logparser_llm_spark.plans.queries`` —
every implemented operator from SURVEY.md §2 plus the training-data
ops, each with a DuckDB oracle (all are SQL-expressible, including
the clustering flagship: its corpus has exactly 5 well-separated
templates, so pattern-rank reproduces the canonical template ids).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logparser_llm_spark.plans.queries import (  # noqa: E402
    oracle_sqls,
    q_parse_route_agg,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full distributed Drain
    pipeline (discover → merge → broadcast assign → md5 fan-out route →
    per-sink counts)."""
    return q_parse_route_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents (tables pre-registered as views)."""
    return oracle_sqls()
