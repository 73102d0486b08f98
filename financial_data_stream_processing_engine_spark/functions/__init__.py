"""Scalar/aggregate helper functions built on pyspark.sql.functions."""

from financial_data_stream_processing_engine_spark.functions.numeric import davg, dsum

__all__ = ["davg", "dsum"]
