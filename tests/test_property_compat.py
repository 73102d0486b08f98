"""Property-based tests: the Spark compat core vs the pure-Python
reference oracle on randomized tick sequences (hypothesis).

Catches interleaving corner cases hand-written goldens miss: NULL
bursts, all-dropped prefixes, single-symbol vs many-symbol mixes,
n=1 windows.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from financial_data_stream_processing_engine_spark.operators.core import (
    clean,
    moving_average,
    with_alert_flag,
)
from tests.reference_semantics import reference_pipeline

TICK_FIELDS = "id string, symbol string, price double, volume long, ts timestamp, source string"

price_strategy = st.one_of(
    st.none(),
    st.floats(min_value=-10, max_value=300, allow_nan=False, width=32),
)
tick_strategy = st.tuples(
    st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),
    price_strategy,
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
)


@given(
    rows=st.lists(tick_strategy, min_size=0, max_size=40),
    n=st.integers(min_value=1, max_value=6),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pipeline_matches_reference_oracle(spark, rows, n):
    base = dt.datetime(2024, 1, 1)
    data = [
        (f"t{i:04d}", s, float(p) if p is not None else None, v,
         base + dt.timedelta(seconds=i), "src")
        for i, (s, p, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, TICK_FIELDS) if data else spark.createDataFrame([], TICK_FIELDS)
    out = with_alert_flag(
        moving_average(clean(df), n=n, order_by=("ts", "id")), threshold=108.0
    )
    got = [r.asDict() for r in out.orderBy("ts", "id").collect()]
    exp = reference_pipeline(
        [{"symbol": s, "price": float(p) if p is not None else None, "volume": v} for s, p, v in rows],
        n=n,
        threshold=108.0,
    )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["symbol"] == e["symbol"]
        assert g["volume"] == e["volume"]
        if e["moving_average"] is None:
            assert g["moving_average"] is None, (g, e)
        else:
            assert g["moving_average"] == pytest.approx(e["moving_average"], rel=1e-9)
        assert g["alert"] == e["alert"]
