"""Batch source adapters + per-source normalization (N1, SURVEY §2.1).

Each reference adapter normalizes a source-specific shape into the
unified tick schema (financial_engine.py:186-194, :234-235, :270-273).
Here each normalizer is a pure projection over a DataFrame of the raw
source shape, so the same function serves batch replay and streaming
(`readStream` produces the same columns).

Nondeterministic fields (``id`` = source-tagged uuid, ``ts`` =
ingestion time — reference :187, :191) are injectable for tests
(SURVEY §7 hard part #4): pass ``id_expr``/``ts_expr`` to pin them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Raw field names per source, from the reference.
#: AlphaVantage GLOBAL_QUOTE payload keys (financial_engine.py:186-190).
AV_SYMBOL, AV_PRICE, AV_VOLUME = "01. symbol", "05. price", "06. volume"
#: Mock WebSocket message keys (financial_engine.py:220-223).
WS_FIELDS = ("instrument", "value", "vol", "ts")

#: The reference's embedded mock CSV (financial_engine.py:246).
MOCK_CSV_ROWS = [
    ("MSFT_mock", "205.50", "30000"),
    ("TSLA_mock", "880.10", "60000"),
    ("NVDA_mock", "550.25", "45000"),
]
MOCK_CSV_COLUMNS = ("symbol", "price", "volume")


def _finish(
    df: DataFrame,
    source: str,
    symbol: Column,
    price: Column,
    volume: Column,
    id_expr: Column | None,
    ts_expr: Column | None,
) -> DataFrame:
    """Common tail of every normalizer: unified column set + provenance."""
    id_col = (
        id_expr
        if id_expr is not None
        else F.concat(F.lit(source), F.lit("_"), F.expr("uuid()"))
    )
    ts_col = ts_expr if ts_expr is not None else F.current_timestamp()
    # try_cast, not cast: under ANSI mode (Spark 4 default) a malformed
    # string would fail the whole job; the reference instead drops the
    # offending row (the adapter's cast raises and the poll returns
    # nothing — per-row exception isolation, financial_engine.py:358-365).
    # A malformed price yields NULL and clean() drops it downstream; a
    # *present but malformed* volume must drop the row here, because the
    # cleaner could not tell it from a never-present volume.  The ts
    # cast is try_cast for the same per-row-isolation reason: one
    # malformed timestamp string must drop its row, not kill the job.
    out = df.select(
        id_col.alias("id"),
        symbol.cast("string").alias("symbol"),
        price.try_cast("double").alias("price"),
        volume.try_cast("long").alias("volume"),
        volume.isNotNull().alias("_had_volume"),
        ts_col.try_cast("timestamp").alias("ts"),
        F.lit(source).alias("source"),
    )
    return out.filter(~F.col("_had_volume") | F.col("volume").isNotNull()).drop(
        "_had_volume"
    )


def normalize_alpha_vantage(
    raw: DataFrame,
    id_expr: Column | None = None,
    ts_expr: Column | None = None,
) -> DataFrame:
    """AlphaVantage GLOBAL_QUOTE rows → tick schema.

    Reference financial_engine.py:186-194: project the quoted keys,
    cast price/volume from strings, stamp arrival time (the API only
    provides a trade *date*, so the reference uses ingestion time,
    :191-192), tag provenance.

    The drop rule mirrors the reference EXACTLY (:180-190): a quote
    missing its PRICE or VOLUME string returns None, and a price/
    volume string that fails its float()/int() cast raises into the
    adapter's except → None — so rows with NULL price or volume after
    the try_casts are dropped here.  The SYMBOL is deliberately NOT
    checked: the reference never tests '01. symbol', so a
    missing-symbol quote flows through with symbol=None (the cleaner
    keeps it, the MA passes it through untouched).
    """
    cols = dict.fromkeys(raw.columns)
    sym = F.col(f"`{AV_SYMBOL}`") if AV_SYMBOL in cols else F.lit(None)
    price = F.col(f"`{AV_PRICE}`") if AV_PRICE in cols else F.lit(None)
    vol = F.col(f"`{AV_VOLUME}`") if AV_VOLUME in cols else F.lit(None)
    out = _finish(raw, "AlphaVantage", sym, price, vol, id_expr, ts_expr)
    return out.filter(F.col("price").isNotNull() & F.col("volume").isNotNull())


def normalize_websocket(
    raw: DataFrame,
    id_expr: Column | None = None,
    ts_expr: Column | None = None,
) -> DataFrame:
    """Mock-WebSocket messages {instrument, value, vol, ts} → tick schema.

    Reference financial_engine.py:234-235 — pure rename; the message
    carries its own (ingestion-side) timestamp (:223).
    """
    ts = ts_expr if ts_expr is not None else F.col("ts").cast("timestamp")
    return _finish(
        raw, "WebSocketMock", F.col("instrument"), F.col("value"), F.col("vol"),
        id_expr, ts,
    )


def normalize_csv(
    raw: DataFrame,
    id_expr: Column | None = None,
    ts_expr: Column | None = None,
) -> DataFrame:
    """CSV rows {symbol, price, volume} (strings) → tick schema.

    Reference financial_engine.py:251, :270-273: float/int casts plus a
    fresh arrival timestamp per emission (:258).
    """
    return _finish(
        raw, "CSVMock", F.col("symbol"), F.col("price"), F.col("volume"),
        id_expr, ts_expr,
    )


def mock_csv_frame(spark) -> DataFrame:
    """The reference's embedded 3-row mock CSV as a raw DataFrame."""
    return spark.createDataFrame(MOCK_CSV_ROWS, list(MOCK_CSV_COLUMNS))
