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

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from sparksearch.entry_queries import (  # noqa: E402
    LAZY_ORACLE_SQL,
    ORACLE_SQL,
    SPARK_QUERIES,
    flagship,
)

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the sparksearch package to executor Python workers.

    If the hosting process was started outside the repo (cwd elsewhere,
    PYTHONPATH unset), the driver-side ``sys.path`` tweak above does not
    reach the executors' Python workers and every pandas-UDF unpickle
    fails with ModuleNotFoundError.  ``addPyFile`` of a package zip is the
    mechanism that works regardless of launch environment (same as
    spark-submit --py-files).
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), f"sparksearch_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(_REPO_DIR, "sparksearch")
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full index-build + block-max WAND top-k at sf0.001."""
    _ensure_shipped(spark)
    return flagship(spark)


def _wrap(fn: Callable) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in SPARK_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLE_SQL)
    for name, gen in LAZY_ORACLE_SQL.items():
        # fixture-backed oracles: a single-threaded Python twin computes the
        # expected rows (at the $SPARK_GRAFT_TESTDATA sf, default sf0.01 —
        # the driver's correctness scale) and emits a typed VALUES table
        out[name] = gen()
    return out
