"""Streaming sinks: the Observer fan-out, Spark-style.

The reference attaches console/logging/alert observers to one subject
and deep-copies each event per observer (financial_engine.py:59-110;
SURVEY.md §2.1 O1/K1/K2/K3).  With DataFrames the fan-out is free —
each sink is its own StreamingQuery over the same immutable upstream —
and observer isolation is structural, not deepcopy-based.

``foreachBatch`` callables get (batch_df, epoch_id) with exactly-once
semantics per epoch when the callable is idempotent on epoch_id.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from financial_data_stream_processing_engine_spark.config import DEFAULT_CONFIG, EngineConfig


def console_sink(df: DataFrame, name: str = "console") -> StreamingQuery:
    """K1 ConsoleNotifier: print every micro-batch."""
    return df.writeStream.format("console").option("truncate", "false").queryName(name).start()


def memory_sink(df: DataFrame, name: str, output_mode: str = "append") -> StreamingQuery:
    """Test/debug sink: results land in the in-memory table ``name``."""
    return (
        df.writeStream.format("memory").queryName(name).outputMode(output_mode).start()
    )


def logging_sink(
    df: DataFrame,
    logger: Callable[[str], None],
    config: EngineConfig = DEFAULT_CONFIG,
    name: str = "logging",
) -> StreamingQuery:
    """K2 LoggingModule: emit row counts per epoch, only when the
    configured log level is INFO (financial_engine.py:93)."""

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        if config.log_level == "INFO":
            logger(f"epoch={epoch_id} rows={batch_df.count()}")

    return df.writeStream.foreachBatch(emit).queryName(name).start()


def alert_sink(
    df: DataFrame,
    on_alert: Callable[[list], None],
    threshold: float | None = None,
    ma_col: str = "moving_average",
    config: EngineConfig = DEFAULT_CONFIG,
    name: str = "alerts",
    max_alerts_per_epoch: int = 10_000,
) -> StreamingQuery:
    """K3 AlertGenerator as a foreachBatch sink.

    Filters each epoch to rows whose moving average exceeds the
    threshold (strictly greater, financial_engine.py:104) and hands the
    alerts to the callback.  The filter runs engine-side; only actual
    alerts reach Python, and the per-epoch driver fetch is capped at
    ``max_alerts_per_epoch`` — a mis-set threshold over a 100 TB stream
    must not materialize the world on the driver.  When the cap trips,
    the callback receives the capped batch plus the true count via the
    trailing sentinel tuple ``("__overflow__", n_alerts)``.
    """
    t = config.price_alert_threshold if threshold is None else threshold

    def emit(batch_df: DataFrame, epoch_id: int) -> None:
        hits = batch_df.filter(F.col(ma_col) > F.lit(t))
        alerts = hits.limit(max_alerts_per_epoch + 1).collect()
        if len(alerts) > max_alerts_per_epoch:
            alerts = alerts[:max_alerts_per_epoch] + [
                ("__overflow__", hits.count())
            ]
        if alerts:
            on_alert(alerts)

    return df.writeStream.foreachBatch(emit).queryName(name).start()
