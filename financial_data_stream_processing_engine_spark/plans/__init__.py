"""Query catalog: the engine's public operator inventory.

``catalog.QUERIES`` maps every implemented operator to a PySpark
callable plus (where SQL-expressible) a DuckDB oracle SQL string —
this is what ``__spark_entry__.py`` exposes to the driver harness.
"""

from financial_data_stream_processing_engine_spark.plans.catalog import QUERIES, CatalogQuery, register

__all__ = ["QUERIES", "CatalogQuery", "register"]
