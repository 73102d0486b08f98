"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query catalog
(``financial_data_stream_processing_engine_spark.plans.catalog``): every implemented
operator registers a (PySpark fn, DuckDB oracle SQL) pair there; this
module just re-exposes the registry in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from financial_data_stream_processing_engine_spark.plans import catalog as _catalog  # noqa: E402

_catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.QUERIES["ma_alerts"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only check)."""
    return {name: q.sql for name, q in _catalog.QUERIES.items() if q.sql is not None}
