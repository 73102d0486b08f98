"""DataFrame->DataFrame operator combinators.

Every operator is a pure function taking and returning DataFrames, so
the logical plan stays fully declarative and Catalyst can optimize
across operator boundaries (predicate pushdown through our combinators,
column pruning into the parquet scan, join re-ordering).
"""

from financial_data_stream_processing_engine_spark.operators.core import (
    alerts,
    clean,
    moving_average,
    union_sources,
    with_alert_flag,
)

__all__ = ["alerts", "clean", "moving_average", "union_sources", "with_alert_flag"]
