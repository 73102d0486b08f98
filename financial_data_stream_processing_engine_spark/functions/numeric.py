"""Order-independent floating-point aggregation helpers.

Summing doubles is not associative: Spark's partial+final aggregation
and DuckDB's parallel aggregation sum in different orders, so
``SUM(double)`` can differ in the last ulps between engines (and
between runs at different parallelism!).  For deterministic,
oracle-comparable results we accumulate exactly: cast each addend to a
wide DECIMAL (exact, order-independent integer arithmetic underneath),
sum, and cast the final result back to DOUBLE.

The DECIMAL(27,7) default keeps 7 fractional digits — the inputs here
are prices/quantities with <=4 decimal digits, and products like
``extendedprice * (1 - discount)`` stay well within 7 — and 20 integer
digits, enough for ~1e13 rows of 1e6-sized values, i.e. 100 TB-scale
safe.  Deterministic results at ANY parallelism is also an operational
win at scale: re-running a 1000-executor job gives bit-identical
output.

``DSUM_SQL``/``DAVG_SQL`` are the matching DuckDB spellings.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DECIMAL = "decimal(27,7)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact (order-independent) sum of a double expression → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact sum / count → DOUBLE.

    try_divide: a group whose values are all NULL has count 0 — the
    mean is NULL, not an ANSI DIVIDE_BY_ZERO job failure.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.try_divide(F.sum(c.cast(DECIMAL)).cast("double"), F.count(c))
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    """DuckDB spelling of :func:`dsum` over SQL expression ``expr``."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,7))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB spelling of :func:`davg`."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(27,7))) AS DOUBLE) / COUNT({expr}))"
