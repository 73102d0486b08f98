"""Stateful streaming: the row-count moving average (SURVEY.md §7 hard
part #1).

Spark's native streaming windows are time-based; the reference's
flagship operator is a row-count window per key (deque(maxlen=N),
financial_engine.py:305).  Streaming parity therefore needs custom
keyed state: ``applyInPandasWithState`` with a per-key ring buffer.

Differences from the reference, by design:
* state carries a TTL (ProcessingTimeTimeout) — the reference leaks
  state forever for unbounded key sets (:298), which cannot survive
  100 TB key cardinalities;
* arrival order is defined as (ts, id) within each micro-batch — the
  reference's asyncio task ordering is nondeterministic anyway
  (SURVEY.md §3.2), so we define a deterministic order instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "id string, symbol string, price double, volume bigint, ts timestamp, "
    "source string, moving_average double"
)
STATE_SCHEMA = "prices array<double>"


def _sorted_batch(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame | None:
    """The ONE deterministic arrival-order rule for a micro-batch's
    group rows, shared by every stateful update function: buffer the
    entire group (the iterator yields Arrow chunks, and a per-chunk
    sort would only be deterministic within a chunk), then stable-sort
    by (ts, numeric id, id) — ties on ts break by id numerically when
    id encodes a number (matching the batch operators' event_id
    order), falling back to the string itself.  Returns None for an
    empty group so callers can skip.  A single copy: the ordering rule
    is parity-critical, and six hand-copied spellings had already
    started to drift."""
    chunks = [c for c in pdfs if len(c)]
    if not chunks:
        return None
    pdf = pd.concat(chunks, ignore_index=True)
    idnum = pd.to_numeric(pdf["id"], errors="coerce")
    return (
        pdf.assign(__idnum=idnum)
        .sort_values(["ts", "__idnum", "id"], kind="mergesort")
        .drop(columns="__idnum")
    )


def streaming_moving_average(
    ticks: DataFrame,
    n: int = 5,
    ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Per-symbol row-count moving average over a tick stream.

    Semantics match operators.core.moving_average (and the reference,
    financial_engine.py:293-312): NULL until exactly ``n`` prices have
    been buffered for the key, then the sliding mean of the last ``n``.
    Sum order is oldest→newest (matches the reference's ``sum(deque)``).

    State: one double[<=n] ring buffer per key — O(n) bytes; expired
    after ``ttl_ms`` without traffic.  Scale: state store shards by the
    group key across executors; a hot symbol is one partition but state
    is tiny and the per-batch work is O(batch rows).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (prices,) = state.get if state.exists else ([],)
        prices = list(prices)
        pdf = _sorted_batch(pdfs)
        if pdf is not None:
            mas = []
            for price in pdf["price"]:
                ma = None
                if price is not None and not pd.isna(price):
                    prices.append(float(price))
                    if len(prices) > n:
                        del prices[: len(prices) - n]
                    if len(prices) == n:
                        ma = sum(prices) / n  # oldest→newest, like sum(deque)
                mas.append(ma)
            out = pdf.copy()
            out["moving_average"] = pd.Series(mas, index=pdf.index, dtype="float64")
            yield out
        state.update((prices,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    # NULL-symbol rows never enter keyed state in the reference (:303);
    # route them around the stateful op untouched (union back with NULL ma).
    keyed = ticks.filter(ticks.symbol.isNotNull())
    passthrough = ticks.filter(ticks.symbol.isNull()).withColumn(
        "moving_average", F.lit(None).cast("double")
    )
    # NoTimeout when TTL is disabled: with ProcessingTimeTimeout the
    # engine schedules continuous empty micro-batches purely to check
    # timeouts, which also keeps processAllAvailable() from settling in
    # synchronous tests.
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    out = keyed.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
    return out.unionByName(passthrough)


EWMA_OUTPUT_SCHEMA = (
    "id string, symbol string, price double, volume bigint, ts timestamp, "
    "source string, ewma double"
)
EWMA_STATE_SCHEMA = "s double"


def streaming_ewma(
    ticks: DataFrame,
    alpha: float = 0.2,
    ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Per-symbol EWMA over a tick stream — the streaming twin of
    operators.core.ewma: s_i = α·v_i + (1-α)·s_{i-1}, state = ONE
    double per key (the smallest possible keyed state; compare the
    ring buffer the row-count MA needs).

    Batch order is defined like streaming_moving_average: whole group
    buffered, sorted by (ts, numeric id).  NULL prices emit NULL and
    carry state; NULL symbols bypass keyed state entirely.
    """
    a, b = float(alpha), 1.0 - float(alpha)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (s,) = state.get if state.exists else (None,)
        pdf = _sorted_batch(pdfs)
        if pdf is not None:
            out = []
            for price in pdf["price"]:
                if price is None or pd.isna(price):
                    out.append(None)
                    continue
                s = float(price) if s is None else a * float(price) + b * s
                out.append(s)
            res = pdf.copy()
            res["ewma"] = pd.Series(out, index=pdf.index, dtype="float64")
            yield res
        state.update((s,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    keyed = ticks.filter(ticks.symbol.isNotNull())
    passthrough = ticks.filter(ticks.symbol.isNull()).withColumn(
        "ewma", F.lit(None).cast("double")
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    out = keyed.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
    return out.unionByName(passthrough)


MACD_OUTPUT_SCHEMA = (
    "id string, symbol string, price double, volume bigint, ts timestamp, "
    "source string, macd double, macd_signal double, macd_histogram double"
)
MACD_STATE_SCHEMA = "ef double, es double, sig double"


def streaming_macd(
    ticks: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Per-symbol MACD over a tick stream — the streaming twin of
    operators.finance.macd: three coupled EMA recurrences whose entire
    keyed state is THREE doubles (fast EMA, slow EMA, signal EMA).

    Per row the op order matches the batch fold exactly — advance fast,
    advance slow, subtract, advance signal, subtract — so
    streaming/batch/oracle agreement is bitwise.  NULL prices emit NULL
    and carry state; NULL symbols bypass keyed state.  Like the other
    stateful ops, arrival order is defined as (ts, numeric id) within
    each micro-batch, and state carries a TTL.
    """
    af, bf = 2.0 / (fast + 1.0), 1.0 - 2.0 / (fast + 1.0)
    as_, bs = 2.0 / (slow + 1.0), 1.0 - 2.0 / (slow + 1.0)
    ag, bg = 2.0 / (signal + 1.0), 1.0 - 2.0 / (signal + 1.0)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ef, es, sig = state.get if state.exists else (None, None, None)
        pdf = _sorted_batch(pdfs)
        if pdf is not None:
            m_out, s_out, h_out = [], [], []
            for price in pdf["price"]:
                if price is None or pd.isna(price):
                    m_out.append(None)
                    s_out.append(None)
                    h_out.append(None)
                    continue
                v = float(price)
                ef = v if ef is None else af * v + bf * ef
                es = v if es is None else as_ * v + bs * es
                m = ef - es
                sig = m if sig is None else ag * m + bg * sig
                m_out.append(m)
                s_out.append(sig)
                h_out.append(m - sig)
            res = pdf.copy()
            res["macd"] = pd.Series(m_out, index=pdf.index, dtype="float64")
            res["macd_signal"] = pd.Series(s_out, index=pdf.index, dtype="float64")
            res["macd_histogram"] = pd.Series(h_out, index=pdf.index, dtype="float64")
            yield res
        state.update((ef, es, sig))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    keyed = ticks.filter(ticks.symbol.isNotNull())
    passthrough = (
        ticks.filter(ticks.symbol.isNull())
        .withColumn("macd", F.lit(None).cast("double"))
        .withColumn("macd_signal", F.lit(None).cast("double"))
        .withColumn("macd_histogram", F.lit(None).cast("double"))
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    out = keyed.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=MACD_OUTPUT_SCHEMA,
        stateStructType=MACD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
    return out.unionByName(passthrough)


ZSCORE_OUTPUT_SCHEMA = (
    "id string, symbol string, price double, volume bigint, ts timestamp, "
    "source string, baseline_mean double, baseline_sd double, zscore double"
)
ZSCORE_STATE_SCHEMA = "prices array<double>"


def streaming_zscore_alerts(
    ticks: DataFrame,
    n: int = 20,
    z_threshold: float = 3.0,
    ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Per-symbol causal z-score anomaly alerts over a tick stream —
    the streaming twin of operators.finance.zscore_anomalies: a ring
    buffer of the PREVIOUS ``n`` prices per key scores each incoming
    tick before it enters the buffer, and only |z| ≥ threshold rows
    are emitted (the alert stream is tiny by construction).

    Bitwise batch parity: the buffer's Σ and Σ² replicate the batch
    operator's DECIMAL(27,7) window sums exactly — each double is
    quantized via its shortest repr at scale 7 (what Spark's
    double→decimal cast does) and accumulated in Python ``Decimal``
    (exact), with one correctly-rounded float conversion at the end;
    everything after is the same straight-line IEEE arithmetic.  This
    is the reference's threshold alert (financial_engine.py:101-106)
    as a self-calibrating streaming detector.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    quant = Decimal("0.0000001")

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (prices,) = state.get if state.exists else ([],)
        prices = list(prices)
        pdf = _sorted_batch(pdfs)
        if pdf is not None:
            mus, sds, zs, keep = [], [], [], []
            for price in pdf["price"]:
                flag = False
                mu = sd = z = None
                p = None if price is None or pd.isna(price) else float(price)
                if p is not None:
                    # batch parity: the ROWS −n..−1 frame counts every
                    # row as a slot and requires count(price) == n, so
                    # a window containing a NULL price never scores —
                    # the buffer mirrors that by storing NULL slots
                    # (appended below) and scoring only all-non-null
                    # full windows
                    if len(prices) == n and not any(
                        v is None for v in prices
                    ):
                        sx = float(
                            sum(
                                Decimal(repr(v)).quantize(quant, ROUND_HALF_UP)
                                for v in prices
                            )
                        )
                        sxx = float(
                            sum(
                                Decimal(repr(v * v)).quantize(quant, ROUND_HALF_UP)
                                for v in prices
                            )
                        )
                        mu = sx / float(n)
                        var = (sxx - sx * sx / float(n)) / float(n - 1)
                        # math.sqrt is correctly rounded (IEEE), matching
                        # the batch plan's SQRT; `** 0.5` (libm pow) is not
                        # guaranteed to be
                        sd = math.sqrt(max(var, 0.0))
                        z = (p - mu) / sd if sd != 0.0 else None
                        flag = z is not None and abs(z) >= z_threshold
                # EVERY row consumes a buffer slot, NULL prices
                # included — exactly like the batch ROWS frame
                prices.append(p)
                if len(prices) > n:
                    del prices[: len(prices) - n]
                mus.append(mu)
                sds.append(sd)
                zs.append(z)
                keep.append(flag)
            out = pdf.copy()
            out["baseline_mean"] = pd.Series(mus, index=pdf.index, dtype="float64")
            out["baseline_sd"] = pd.Series(sds, index=pdf.index, dtype="float64")
            out["zscore"] = pd.Series(zs, index=pdf.index, dtype="float64")
            out = out[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield out
        state.update((prices,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    keyed = ticks.filter(ticks.symbol.isNotNull())
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


SESSION_OUTPUT_SCHEMA = (
    "symbol string, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us long, end_us long, n long"


def streaming_sessionize_timeout(
    ticks: DataFrame,
    gap_s: int = 7200,
) -> DataFrame:
    """Per-key sessionization with WATERMARK-DRIVEN emission — the
    state-timeout feature the built-in session window hides: a session
    closes either when a later event in the stream exceeds the gap
    (emitted inline) or when the EVENT-TIME watermark passes
    last_event + gap (``GroupStateTimeout.EventTimeTimeout`` fires the
    update function with ``hasTimedOut`` and no data, and the open
    session is flushed from state).  Exactly-once per session: a
    session is emitted from precisely one of the two paths.

    State per key is three longs — O(1) regardless of session length —
    and expires the moment the watermark proves no more events can
    join, which is the minimal-retention contract for unbounded key
    sets at scale.  Semantics match the batch gap rule exactly
    (strictly-greater-than-gap starts a new session), so batch
    sessionization is the oracle.
    """
    gap_us = gap_s * 1_000_000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def frame(rows: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "symbol": [key[0]] * len(rows),
                    "session_start": [
                        pd.to_datetime(s, unit="us") for s, _, _ in rows
                    ],
                    "session_end": [
                        pd.to_datetime(e, unit="us") for _, e, _ in rows
                    ],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield frame([(start_us, end_us, n)])
            return
        pdf = _sorted_batch(pdfs)
        if pdf is None:
            return
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = None
            n = 0
        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, end_us, n = t, t, 1
            elif t - end_us > gap_us:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = t, t, 1
            else:
                # max/min, not assignment: a late-but-within-watermark
                # event from a later BATCH can carry t < end_us —
                # rewinding end_us would let a following event falsely
                # split the session and could push setTimeoutTimestamp
                # at/below the current watermark (a fatal streaming
                # error).  The session envelope only ever widens.
                start_us = min(start_us, t)
                end_us = max(end_us, t)
                n += 1
        state.update((start_us, end_us, n))
        # fire when the event-time watermark passes session end + gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_s * 1000)
        if closed:
            yield frame(closed)

    keyed = ticks.filter(ticks.symbol.isNotNull())
    return keyed.groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


PATTERN_OUT_SCHEMA = "id string, symbol string, ts timestamp, dist double"
PATTERN_STATE_SCHEMA = "prices array<double>"


def streaming_pattern_distance(
    ticks: DataFrame,
    qvals: list[float],
    length: int = 8,
    ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Per-symbol z-normalized euclidean distance of every length-
    ``length`` sliding price window to the query pattern ``qvals`` —
    the streaming twin of ``operators.finance.pattern_match_topk``.

    State: one double[<=length] ring buffer per key (the
    ``streaming_moving_average`` shape).  A row is emitted once the
    buffer is full and the window has nonzero variance (flat windows
    are dropped exactly like the batch operator).

    Bitwise parity contract: every float op replicates the batch
    expression tree — mean and variance are LEFT-ASSOCIATED Python
    float chains over oldest→newest prices, the query statistics are
    folded once with the identical chains, and each distance term is
    ``((v−m)/s − (q−qm)/qs)²`` accumulated left-to-right.  Python
    floats ARE IEEE doubles, so streamed distances equal the batch
    (and DuckDB-oracle) distances bit-for-bit.
    """
    import math

    acc = qvals[0]
    for v in qvals[1:]:
        acc = acc + v
    qm = acc / float(length)
    acc2 = (qvals[0] - qm) * (qvals[0] - qm)
    for v in qvals[1:]:
        acc2 = acc2 + (v - qm) * (v - qm)
    qs = math.sqrt(acc2 / float(length))
    if qs <= 0:
        raise ValueError("query pattern has zero variance")
    zq = [(q - qm) / qs for q in qvals]

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math as _math

        if state.hasTimedOut:
            state.remove()
            return
        (prices,) = state.get if state.exists else ([],)
        prices = list(prices)
        pdf = _sorted_batch(pdfs)
        if pdf is not None:
            out_rows = []
            for row in pdf.itertuples(index=False):
                price = row.price
                # batch parity: the lag-chain counts every ROW as a
                # window slot, and any window containing a NULL price
                # yields NULL stats (dropped) — so NULL prices consume
                # a slot here too and poison the windows they sit in
                p = None if price is None or pd.isna(price) else float(price)
                prices.append(p)
                if len(prices) > length:
                    del prices[: len(prices) - length]
                if p is None or len(prices) < length or any(
                    v is None for v in prices
                ):
                    continue
                m_acc = prices[0]
                for v in prices[1:]:
                    m_acc = m_acc + v
                m = m_acc / float(length)
                v_acc = (prices[0] - m) * (prices[0] - m)
                for v in prices[1:]:
                    v_acc = v_acc + (v - m) * (v - m)
                s = _math.sqrt(v_acc / float(length))
                if not s > 0:
                    continue
                d0 = (prices[0] - m) / s - zq[0]
                d_acc = d0 * d0
                for i in range(1, length):
                    di = (prices[i] - m) / s - zq[i]
                    d_acc = d_acc + di * di
                out_rows.append((row.id, row.symbol, row.ts, d_acc))
            if out_rows:
                yield pd.DataFrame(
                    out_rows, columns=["id", "symbol", "ts", "dist"]
                )
        state.update((prices,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return ticks.filter(ticks.symbol.isNotNull()).groupBy("symbol").applyInPandasWithState(
        update,
        outputStructType=PATTERN_OUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
