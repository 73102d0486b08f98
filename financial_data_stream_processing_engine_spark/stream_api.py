"""Fluent user API — the SURVEY §3.4 surface.

A thin immutable wrapper over a (batch or streaming) DataFrame whose
combinators are exactly the ``operators.core`` functions, so the chain

    TickStream.from_parquet(spark, path).clean().moving_average(n=5)
        .alerts(threshold=108.0).df

declares one Catalyst plan — nothing executes until an action/sink.
Mirrors the reference's pipeline composition (financial_engine.py:
342-344 builds ["cleaner", "moving_average"] from config; the alert
observer filters at :101-106) as chainable, inspectable DataFrame
algebra: the same code path serves batch replays and live streams
because every combinator is a pure DataFrame→DataFrame function.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from financial_data_stream_processing_engine_spark.operators import core
from financial_data_stream_processing_engine_spark.schema import TICK_SCHEMA


@dataclass(frozen=True)
class TickStream:
    """An immutable tick pipeline; each combinator returns a new one."""

    df: DataFrame

    # -- sources ----------------------------------------------------------

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str) -> "TickStream":
        return cls(spark.read.schema(TICK_SCHEMA).parquet(path))

    @classmethod
    def from_stream(cls, spark: SparkSession, path: str) -> "TickStream":
        """File-stream twin of :meth:`from_parquet` (same schema)."""
        return cls(spark.readStream.schema(TICK_SCHEMA).parquet(path))

    @classmethod
    def wrap(cls, df: DataFrame) -> "TickStream":
        return cls(df)

    # -- combinators (reference-compat core) ------------------------------

    def clean(self) -> "TickStream":
        """F1: drop null/non-positive prices, clamp volume ≥ 0."""
        return TickStream(core.clean(self.df))

    def moving_average(self, n: int = 5) -> "TickStream":
        """A1: per-symbol row-count moving average (full windows only)."""
        return TickStream(core.moving_average(self.df, n=n))

    def ewma(self, alpha: float = 0.2) -> "TickStream":
        return TickStream(core.ewma(self.df, alpha=alpha))

    def with_alert_flag(self, threshold: float = 108.0) -> "TickStream":
        return TickStream(core.with_alert_flag(self.df, threshold=threshold))

    def alerts(self, threshold: float = 108.0) -> "TickStream":
        """K3: rows whose moving average exceeds the threshold."""
        return TickStream(core.alerts(self.df, threshold=threshold))

    def union(self, *others: "TickStream") -> "TickStream":
        """U1: merge sources; downstream keyed state is shared."""
        return TickStream(core.union_sources(self.df, *[o.df for o in others]))

    # -- escape hatch ------------------------------------------------------

    def transform(self, fn) -> "TickStream":
        """Apply any DataFrame→DataFrame function in the chain."""
        return TickStream(fn(self.df))
