"""Event-time windowed aggregations with watermarks.

The reference has NO event-time handling — timestamps are ingestion
time and state never expires (financial_engine.py:191-192, :298;
SURVEY.md §2.1 gotcha #5).  These operators are the deliberate upgrade:
watermarked tumbling/sliding/session windows whose state Spark evicts
once the watermark passes — the 100 TB requirement the reference's
unbounded dict would break.

Every function works on BOTH a streaming and a batch DataFrame (the
unified DataFrame API): batch runs ignore the watermark, which is
exactly how the parity tests pin streaming results to batch results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from financial_data_stream_processing_engine_spark.functions.numeric import DECIMAL


def _dsum(col: str) -> Column:
    return F.sum(F.col(col).cast(DECIMAL)).cast("double")


def tumbling_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "symbol",
    value: str = "price",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-key tumbling-window count/sum/min/max.

    Streaming: append-mode capable (watermark bounds state); the sum is
    exact-decimal so batch and streaming agree bitwise.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("win"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(value).alias("total"),
            F.min(value).alias("lo"),
            F.max(value).alias("hi"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key,
            "n",
            "total",
            "lo",
            "hi",
        )
    )


def sliding_mean(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "symbol",
    value: str = "price",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-key sliding-window mean (time-based cousin of the reference's
    row-count moving average)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("win"), F.col(key))
        .agg(
            F.try_divide(_dsum(value), F.count(value)).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key,
            "mean_value",
            "n",
        )
    )


def ohlc_candles(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "symbol",
    price: str = "price",
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-key tumbling OHLC candles — the streaming twin of
    ``operators.finance.ohlc_bars``.

    ``min_by``/``max_by`` are declarative aggregates, so the candle
    state Spark keeps per open window is four scalars — not the ticks
    themselves; the watermark bounds how many windows stay open.  The
    reference's domain (candlesticks from a live quote feed) with the
    state-eviction semantics its unbounded dicts lack.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("win"), F.col(key))
        .agg(
            F.min_by(price, ts_col).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, ts_col).alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key,
            "open",
            "high",
            "low",
            "close",
            "n_trades",
        )
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "symbol",
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Session windows: activity bursts separated by >= ``gap`` silence."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key,
            "n",
        )
    )
