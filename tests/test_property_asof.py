"""Property test: asof_join vs pandas merge_asof on random data.

The as-of join is the engine's trickiest composed operator (union-tag +
last-ignorenulls window); pandas' merge_asof is the public reference
implementation of backward as-of semantics, so random cross-checking
pins inclusive and strict modes exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from financial_data_stream_processing_engine_spark.operators.asof import asof_join

event = st.tuples(
    st.integers(min_value=0, max_value=2),      # by-key
    st.integers(min_value=0, max_value=50),     # time (int for simplicity)
    st.integers(min_value=0, max_value=999),    # value
)


@given(
    left_rows=st.lists(event, min_size=1, max_size=25),
    right_rows=st.lists(event, min_size=0, max_size=25),
    strict=st.booleans(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows, strict):
    # de-dup (key, ts) on the right: multiple right rows at the same
    # instant have no defined winner in either implementation
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())
    left_rows = [
        (i, k, t, v) for i, (k, t, v) in enumerate(left_rows)
    ]

    left = spark.createDataFrame(left_rows, "lid long, k long, t long, lv long")
    right = spark.createDataFrame(
        right_rows or [], "k long, t long, rv long"
    ) if right_rows else spark.createDataFrame([], "k long, t long, rv long")

    got = asof_join(left, right, on="t", by="k", value_cols=["rv"], strict=strict)
    got_map = {r.lid: r.rv for r in got.collect()}

    lpdf = pd.DataFrame(left_rows, columns=["lid", "k", "t", "lv"]).sort_values("t")
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "rv"]).sort_values("t")
    if rpdf.empty:
        expected = {lid: None for lid, *_ in left_rows}
    else:
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            on="t",
            by="k",
            direction="backward",
            allow_exact_matches=not strict,
        )
        expected = {
            int(row.lid): (None if pd.isna(row.rv) else int(row.rv))
            for row in merged.itertuples()
        }

    assert set(got_map) == set(expected)
    assert got_map == expected


def test_asof_attaches_latest_row_as_is_with_null_fields(spark):
    """merge_asof semantics: the LATEST right row attaches whole, NULL
    fields included — per-column last(ignorenulls) would see through
    the NULL and stitch bid from one row with ask from another."""
    left = spark.createDataFrame([(1, 10, 3)], "lid long, k long, t long")
    right = spark.createDataFrame(
        [(10, 1, 10.0, 11.0), (10, 2, None, 12.0)],
        "k long, t long, bid double, ask double",
    )
    row = asof_join(left, right, on="t", by="k", value_cols=["bid", "ask"]).collect()[0]
    assert row.ask == 12.0
    assert row.bid is None  # NOT 10.0 from the older row
