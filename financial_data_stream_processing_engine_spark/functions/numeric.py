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


#: Quantized-integer accumulation for FULL-PRECISION doubles (ratios,
#: returns, means produced by division).  The DECIMAL route above is
#: only cross-engine exact when the doubles carry few significant
#: decimal digits: rounding an arbitrary 17-digit double at a decimal
#: scale is engine-dependent at the last ulp (Spark converts via the
#: shortest decimal representation, DuckDB via a double multiply by
#: 10^scale).  The deterministic alternative: quantize each addend to
#: an integer grid with ``FLOOR(x * 10^q)`` — the multiply and floor
#: are single IEEE operations, identical everywhere — then sum the
#: resulting integers EXACTLY (decimal(38,0) ≡ int128 underneath) and
#: rescale by ``10^-q`` in double at the very end (integer→double
#: conversion is correctly rounded in both engines).  The statistic is
#: thereby *defined* on the 10^-q grid: documented, deterministic at
#: any parallelism, and engine-independent.
QSCALE = 9  # 1e-9 grid: far below any financially meaningful digit


def qint(col: Column | str, q: int = QSCALE) -> Column:
    """``floor(x·10^q)`` as an exact decimal(38,0) integer addend.

    DOMAIN BOUND: |x| must stay below 2^63/10^q (~9.2e9 at q=9) —
    Spark's ``floor(double)`` returns LONG, so a larger addend would
    saturate at int64 before the decimal cast while the DuckDB
    spelling (FLOOR → HUGEINT) would not, breaking the cross-engine
    guarantee this module exists for.  The decimal(38,0) headroom is
    for the ACCUMULATOR (sums over ~10^9 rows), not the per-row
    addend.  Every current grid use (prices, probabilities, audio
    samples, correlations) sits ≥6 orders below the bound; quantizing
    a new astronomically-scaled column requires a smaller q or a
    pre-scale, not this helper as-is."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(10**q))).cast("decimal(38,0)")


def qint_sql(expr: str, q: int = QSCALE) -> str:
    """DuckDB spelling of :func:`qint` (HUGEINT ≡ the exact-int role)."""
    return f"CAST(FLOOR(({expr}) * {float(10 ** q)!r}) AS HUGEINT)"


def qcast_sql(sum_expr: str) -> str:
    """Correctly-rounded HUGEINT→DOUBLE for oracle SQL.

    DuckDB's direct int128→double cast computes ``upper·2⁶⁴ + lower``
    in double arithmetic — two roundings, so sums above 2⁵³ can land
    one ulp away from Spark's correctly-rounded decimal→double.  The
    VARCHAR bridge forces a correctly-rounded string→double parse
    (fast_float), matching Spark bit-for-bit at any magnitude.
    """
    return f"CAST(CAST(({sum_expr}) AS VARCHAR) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB spelling of :func:`davg`."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(27,7))) AS DOUBLE) / COUNT({expr}))"


def dlit_sql(x: float) -> str:
    """A Python float as a DuckDB DOUBLE literal, bit-exact.

    DuckDB parses long plain-decimal literals as DECIMAL and its
    decimal→double conversion can land one ulp away from the
    correctly-rounded value (e.g. ``0.15384615384615385`` →
    ``…83``).  Routing through a VARCHAR cast forces the fast_float
    string→double parse, which round-trips ``repr(x)`` exactly —
    matching the Python/Spark constant bit-for-bit.
    """
    return f"CAST('{x!r}' AS DOUBLE)"
