"""Streaming sources.

The reference's three pollers (financial_engine.py:124-275) map to:

* ``rate_ticks``      — the mock-WebSocket feed (S2): Spark's rate
                        source drives synthetic ticks at a configurable
                        rows/sec; the same normalization projection as
                        batch (N1) shapes them into the tick schema.
* ``csv_replay_ticks``— the cyclic CSV mock (S3): rate source joined to
                        the static CSV by ``value % num_rows`` —
                        reproduces the reference's modulo replay
                        (financial_engine.py:259) declaratively.
* ``file_ticks``      — file-based replay of any tick/event table
                        (the production-shaped source: new files in a
                        directory = new micro-batch data).

A live AlphaVantage HTTP poller (S1) is a demo-only concern; its
normalization (``normalize_alpha_vantage``) is the part with query
semantics and is fully covered in batch.  SURVEY.md §7 explicitly
scopes live HTTP out of the correctness core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from financial_data_stream_processing_engine_spark.sources.batch import MOCK_CSV_ROWS


def rate_ticks(
    spark: SparkSession,
    rows_per_second: int = 10,
    symbols: tuple[str, ...] = ("EURUSD", "GBPUSD", "USDJPY"),
) -> DataFrame:
    """Synthetic tick stream in the unified schema (mock WS feed).

    Deterministic per (value) tick content — price/volume derive from
    hash(value) — so tests can assert exact results.
    """
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    sym = F.element_at(
        F.array(*[F.lit(s) for s in symbols]),
        (F.col("value") % len(symbols) + 1).cast("int"),
    )
    price = (F.pmod(F.xxhash64("value"), 10000) / 100.0 + 1.0).cast("double")
    vol = F.pmod(F.xxhash64("value", F.lit(1)), 1000).cast("long")
    return rate.select(
        F.concat(F.lit("WebSocketMock_"), F.col("value").cast("string")).alias("id"),
        sym.alias("symbol"),
        price.alias("price"),
        vol.alias("volume"),
        F.col("timestamp").alias("ts"),
        F.lit("WebSocketMock").alias("source"),
    )


def csv_replay_ticks(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """The reference's cyclic CSV replay as a declarative stream.

    rate.value % num_rows picks the CSV row (financial_engine.py:259);
    each emission gets a fresh arrival timestamp (:258).  The static
    side is broadcast — no shuffle enters the stream.
    """
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    csv = spark.createDataFrame(MOCK_CSV_ROWS, "symbol string, price string, volume string")
    csv = csv.withColumn("__row", F.row_number().over(Window.orderBy("symbol")) - 1)
    n = csv.count()
    joined = rate.withColumn("__row", (F.col("value") % n).cast("int")).join(
        F.broadcast(csv), "__row"
    )
    return joined.select(
        F.concat(F.lit("CSVMock_"), F.col("value").cast("string")).alias("id"),
        F.col("symbol"),
        F.col("price").try_cast("double").alias("price"),
        F.col("volume").try_cast("long").alias("volume"),
        F.col("timestamp").alias("ts"),
        F.lit("CSVMock").alias("source"),
    )


def file_events(spark: SparkSession, directory: str, schema) -> DataFrame:
    """File-source replay: every new file under ``directory`` becomes
    micro-batch input.  Schema must be supplied (no streaming inference)."""
    return spark.readStream.schema(schema).parquet(directory)
