"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All registrations live in :mod:`sparksearch.entry_queries`; see that module
for the micro-integer float convention and the md5-60 portable hash family
that make Spark↔DuckDB value-hash equality exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparksearch.entry_queries import ORACLE_SQL, SPARK_QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full index-build + block-max WAND top-k at sf0.001."""
    return flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
