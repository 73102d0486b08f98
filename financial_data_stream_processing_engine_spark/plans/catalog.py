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

Execution contract: a catalog function normally BUILDS a plan and
returns it unexecuted (the driver collects).  A few entries execute
eagerly inside the function by necessity — streaming entries run a
real StreamingQuery to a memory sink, round-trip entries write fixture
files, and invariant-report entries (e.g. ``dedup_embedding_lsh``)
run counts to build their report row.  Those entries return a small
materialized result; callers embedding catalog functions into larger
lazy pipelines should use the underlying ``operators.*`` functions
instead.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path
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


#: Catalog presentation order — the driver's 50-row check-window
#: rotation.  The list itself is DATA, kept in ``check_window.txt``
#: next to this file (one entry name per line, ``#`` comments) and
#: loaded here at import, deliberately OUTSIDE the freshness hash:
#: ``tools/freshness.py`` hashes the transitive *import* closure of
#: each entry's plan module, and this module is in every closure —
#: when the rotation list lived inline (rounds ≤13), every
#: per-round window rotation invalidated all ~237 ledger rows at
#: once even though presentation order has zero effect on any
#: entry's VALUES.  Only code that can change a result belongs in
#: the hash; the rotation policy is documented in the data file.
_WINDOW_FILE = Path(__file__).with_name("check_window.txt")


def _load_priority() -> list[str]:
    names: list[str] = []
    for line in _WINDOW_FILE.read_text(encoding="utf-8").splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            names.append(line)
    return names


_PRIORITY: list[str] = _load_priority()


def load_all() -> None:
    """Import every module that registers catalog queries, then apply
    the priority presentation order (see ``_PRIORITY``)."""
    # Imported for their @register side effects.
    from financial_data_stream_processing_engine_spark.plans import (  # noqa: F401
        compat_queries,
        relational_queries,
        llm_queries,
        streaming_queries,
        curation_queries,
        finance_queries,
        tpch_derived,
    )

    # a typo in the hand-maintained rotation list would otherwise
    # silently demote an entry out of the driver's 50-slot check
    # window — fail loudly instead
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    if unknown:
        raise AssertionError(f"_PRIORITY names not in QUERIES: {unknown}")
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
