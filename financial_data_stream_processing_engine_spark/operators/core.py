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
    """Drop rows with NULL or non-positive price AND rows with NULL
    volume; clamp surviving volume >= 0.

    Reference: DataCleaner.process (financial_engine.py:283-291).
    Filter first, clamp second — the reference never clamps a row it
    drops.  NULL volume DROPS the row: the reference's
    ``max(0, data.get('volume', 0))`` defaults only a MISSING key,
    while an explicit ``None`` (the WebSocket adapter emits
    ``volume=raw.get('vol')``, :235) raises TypeError and the per-row
    isolation (``_run_pipeline``, :358-365) discards the row.  In the
    tabular schema the column always exists, so NULL is the reference's
    None case — never its missing-key case.
    """
    return df.filter(
        F.col(price_col).isNotNull()
        & (F.col(price_col) > 0)
        & F.col(volume_col).isNotNull()
    ).withColumn(
        volume_col,
        F.greatest(F.lit(0).cast("long"), F.col(volume_col).cast("long")),
    )


def moving_average(
    df: DataFrame,
    n: int = 5,
    key: str = "symbol",
    value: str = "price",
    order_by: tuple[str, ...] = ("ts", "id"),
    out_col: str = "moving_average",
    assume_participating: bool = False,
) -> DataFrame:
    """Per-key row-count sliding mean over the last ``n`` rows.

    Reference: MovingAverageCalculator.process (financial_engine.py:
    293-312).  Gotchas preserved (SURVEY.md §2.1):

    1. Emits only at exactly-full windows — the first n-1 rows per key
       get NULL (reference: field absent, :308-310).
    2. Rows with NULL (or, for string keys, EMPTY — the reference's
       ``if symbol and price is not None`` is a truthiness test, so
       ``''`` does not participate either) key or NULL value pass
       through untouched and do NOT consume state (:303): they neither
       get a moving average nor occupy a slot in the n-row window of
       later rows.
    3. The window is row-count over arrival order, per key — not time
       based.  Batch "arrival order" is ``order_by`` (deterministic
       total order; ``(key, *order_by)`` must be row-unique — pass the
       ingestion-ts plus a tiebreaker).

    Implementation note: the mean is computed as an explicit lag-chain
    sum ``(v + lag(v,1) + … + lag(v,n-1)) / n`` rather than
    ``avg().over(rowsBetween)``.  Semantically identical, but the
    left-to-right IEEE summation order is engine-independent, which
    makes results bit-reproducible against external oracles; it also
    avoids per-row frame re-aggregation.

    To honor gotcha 2 exactly, the lag chain runs over the *filtered*
    frame (participating rows only) and joins back on the row identity
    ``(key, *order_by)`` — a NULL-value row can therefore never occupy
    a lag slot.  That costs one extra shuffle; callers that have
    already run :func:`clean` (every compat pipeline does) can pass
    ``assume_participating=True`` for the single-shuffle direct chain,
    which is identical when every row participates.

    Scale: one window shuffle on ``key`` (+ one join-back shuffle in
    the general path), no Python, state bounded by the frame.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order_by])
    )
    val = F.col(value)
    key_ok = F.col(key).isNotNull()
    if df.schema[key].dataType.simpleString() == "string":
        # the reference's participation test is truthiness, not
        # presence — '' is falsy (gotcha 2)
        key_ok = key_ok & (F.col(key) != "")
    participates = key_ok & val.isNotNull()

    if assume_participating:
        masked = F.when(participates, val)
        total: Column = masked
        for i in range(1, n):
            total = total + F.lag(masked, i).over(w)
        ma = (total / F.lit(float(n))).cast("double")
        # total is NULL unless ALL n frame slots are non-NULL — the
        # reference's "only when the deque is full" gate (:308); valid
        # because the caller guarantees no NULL-value row interleaves.
        return df.withColumn(out_col, F.when(participates, ma))

    part = df.filter(participates)
    total = val
    for i in range(1, n):
        total = total + F.lag(val, i).over(w)
    # the scored side renames its identity columns (a self-derived join
    # would otherwise resolve both sides to the same attribute), and
    # the join-back is null-safe so a participating row with a NULL
    # order_by column still finds its score.
    #
    # Row-uniqueness of (key, *order_by) is REQUIRED (a duplicate
    # identity would fan out the join-back and silently duplicate input
    # rows), so it is enforced engine-side: within the same window pass
    # a tie with the previous row's order_by tuple raises — no extra
    # shuffle, no extra action.
    ident_struct = F.struct(*[F.col(c) for c in order_by])
    dup = F.lag(ident_struct, 1).over(w).eqNullSafe(ident_struct)
    ma_expr = F.when(
        dup,
        F.raise_error(
            F.lit(
                f"moving_average: ({key}, {', '.join(order_by)}) must be "
                "row-unique — pass a tiebreaker order_by column"
            )
        ).cast("double"),
    ).otherwise((total / F.lit(float(n))).cast("double"))
    idents = [key, *order_by]
    scored = part.select(
        *[F.col(c).alias(f"__ma_{i}") for i, c in enumerate(idents)],
        ma_expr.alias(out_col),
    )
    cond = F.lit(True)
    for i, c in enumerate(idents):
        cond = cond & df[c].eqNullSafe(F.col(f"__ma_{i}"))
    joined = df.join(scored, cond, "left").drop(
        *[f"__ma_{i}" for i in range(len(idents))]
    )
    # re-mask after the join-back: a NON-participating row (NULL value)
    # that happens to share (key, *order_by) with a participating row
    # would otherwise inherit that row's score — the uniqueness guard
    # above only sees the participating frame, so it cannot catch the
    # mixed twin; gotcha 2 says the NULL-value row must stay NULL
    return joined.withColumn(out_col, F.when(participates, F.col(out_col)))


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


def ewma(
    df: DataFrame,
    alpha: float = 0.2,
    key: str = "symbol",
    value: str = "price",
    order_by: tuple[str, ...] = ("ts", "id"),
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average,
    s_i = α·v_i + (1-α)·s_{i-1} (s_1 = v_1), rows ordered by
    ``order_by`` within each key.

    A true sequential recurrence: unlike the row-count moving average
    there is no fixed-frame window formulation (every row depends on
    the entire prefix), so this is the canonical grouped-fold case.
    NULL values carry the previous state and emit NULL (they do not
    decay the average) — which rules out pandas' ``ewm`` (it emits the
    carried mean at NaN positions instead of NULL), so the fold stays
    an explicit per-group loop.

    Seam shape (r18, guide §4.5 — the ``finance.macd`` fix): a
    ``groupBy(key).applyInPandas`` invokes Python once PER GROUP, and
    with numerous small keys the ~4 ms per-invocation overhead
    dominates the fold itself.  The loop now rides ``mapInPandas``
    over a key-repartitioned, key-sorted frame — one Python invocation
    per Arrow batch, the batch-boundary key carried into the next
    batch so every group still folds contiguously.

    NULL-key rows bypass the grouped fold entirely and emit NULL (the
    moving_average gotcha-2 convention, and the streaming twin's
    passthrough): folding them as one pseudo-key would chain an EWMA
    across unrelated keyless rows.

    Scale: one shuffle on ``key``; per-batch memory is the Arrow batch
    plus at most one carried group — for very large single keys,
    pre-bucket by a coarse time range and stitch (same pattern as
    operators/asof.py).
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    # a fresh StructType: StructType.add would mutate df's own schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )
    a, b = float(alpha), 1.0 - float(alpha)
    cols = list(df.columns)
    sort_cols = list(order_by)

    def fold(pdf):
        import pandas as pd

        # stable sort on (key, *order_by): groups contiguous, each
        # group internally in exactly the old per-group sort order
        pdf = pdf.sort_values([key, *sort_cols], kind="mergesort")
        state = None
        prev_key = object()
        out = []
        for kv, v in zip(pdf[key], pdf[value]):
            if kv != prev_key:
                state, prev_key = None, kv
            if v is None or pd.isna(v):
                out.append(None)
                continue
            state = float(v) if state is None else a * float(v) + b * state
            out.append(state)
        pdf = pdf.copy()
        pdf[out_col] = pd.Series(out, index=pdf.index, dtype="float64")
        return pdf[cols + [out_col]]

    def fold_batches(batches):
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
            if not len(pdf):
                continue
            # hold back the trailing group: its remaining rows may
            # arrive in the next batch (keys are non-null here, and
            # rows are key-sorted within the partition)
            tail_mask = pdf[key] == pdf[key].iloc[-1]
            head = pdf[~tail_mask]
            carry = pdf[tail_mask]
            if len(head):
                yield fold(head)
        if carry is not None and len(carry):
            yield fold(carry)

    keyed = df.filter(F.col(key).isNotNull())
    passthrough = df.filter(F.col(key).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return (
        keyed.repartition(key)
        .sortWithinPartitions(key, *sort_cols)
        .mapInPandas(fold_batches, schema=out_schema)
        .unionByName(passthrough)
    )
