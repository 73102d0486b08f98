"""Catalog entries for the reference-compat core (SURVEY.md §2.1).

The reference's flagship computation — clean → per-key row-count
moving average → threshold alert (financial_engine.py:283-312,
:97-110) — expressed over the driver's ``events`` table, with
``user_id`` as the symbol-like key and ``value`` as the price
(TESTDATA.md / FIXTURES.md mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators.core import (
    clean,
    moving_average,
    with_alert_flag,
)
from financial_data_stream_processing_engine_spark.plans.catalog import register

MA_N = 5
ALERT_THRESHOLD = 108.0

# The lag-chain mean: identical left-to-right IEEE summation order in
# Spark and DuckDB → bit-reproducible (see operators.core.moving_average).
_MA_EXPR = (
    "(value + lag(value, 1) OVER w + lag(value, 2) OVER w"
    " + lag(value, 3) OVER w + lag(value, 4) OVER w) / 5.0"
)

_MA_ALERTS_SQL = f"""
SELECT event_id, user_id, ts, value,
       {_MA_EXPR} AS moving_average,
       COALESCE(({_MA_EXPR}) > {ALERT_THRESHOLD}, FALSE) AS alert
FROM events
WHERE value IS NOT NULL AND value > 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def _event_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → tick-shaped frame (key=user_id, price=value)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )


@register("ma_alerts", sql=_MA_ALERTS_SQL)
def ma_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: clean → 5-row per-key moving average → alert flag.

    Reference semantics A1+F1+K3 (financial_engine.py:283-312, :97-110):
    NULL/non-positive values dropped first; the mean appears only once
    exactly N=5 rows of the key have arrived; alert iff ma > threshold.
    One shuffle (window partitionBy user_id); no Python in the plan.
    """
    ticks = _event_ticks(spark, sf_dir)
    # events has no volume column, so only the filter half of clean() applies.
    cleaned = ticks.filter(F.col("value").isNotNull() & (F.col("value") > 0))
    ma = moving_average(
        cleaned, n=MA_N, key="user_id", value="value", order_by=("ts", "event_id")
    )
    return with_alert_flag(ma, threshold=ALERT_THRESHOLD)


@register(
    "clean_filter",
    sql="""
SELECT event_id, user_id, ts, value,
       GREATEST(0, COALESCE(user_id, 0)) AS volume
FROM events
WHERE value IS NOT NULL AND value > 0
""",
)
def clean_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 DataCleaner in isolation: price filter then volume clamp.

    Reference financial_engine.py:283-291 — order matters: rows that
    fail the price filter are never clamped.  ``user_id`` stands in for
    the volume column in the events mapping.
    """
    ticks = _event_ticks(spark, sf_dir).withColumn("volume", F.col("user_id"))
    return clean(ticks, price_col="value", volume_col="volume")
