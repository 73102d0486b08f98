"""Operator/query catalog — the registry behind ``__spark_entry__.py``.

Each entry pairs a PySpark implementation with (where expressible) the
ANSI-SQL oracle DuckDB runs on the same parquet tables.  Registration
is declarative::

    @register("q_name", sql="SELECT ...")
    def q_name(spark, sf_dir):
        ...return DataFrame

Parity rules (SURVEY.md §7 hard part #2):

* Alias every computed column identically in Spark and SQL — the driver
  sorts columns by name before hashing.
* Floating-point aggregations must be **order-independent** to hash
  stably across engines: sums of doubles go through an exact DECIMAL
  accumulation (``functions.numeric.dsum``) and are cast back to DOUBLE;
  means are computed as exact-sum / count.  Sliding means use an
  explicit lag-chain so the IEEE summation order is identical in both
  engines.
* Timestamps: parquet ns → cast to µs TIMESTAMP on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None => driver does rows-only check
    doc: str = ""


QUERIES: dict[str, CatalogQuery] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a (spark_fn, oracle_sql) pair to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = CatalogQuery(name=name, fn=fn, sql=sql, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers catalog queries."""
    # Imported for their @register side effects.
    from financial_data_stream_processing_engine_spark.plans import (  # noqa: F401
        compat_queries,
        relational_queries,
        llm_queries,
        streaming_queries,
    )
