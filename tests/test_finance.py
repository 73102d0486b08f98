"""Financial analytics operators: semantic properties on constructed
series, determinism under repartitioning, and plan-shape pins.

Value-level cross-engine correctness lives in the catalog oracles
(plans/finance_queries.py); these tests pin the operator semantics the
oracle can't see — edge cases the fixture doesn't contain — and the
physical plans' scale shape.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators import finance

BASE = dt.datetime(2024, 3, 1)

TICK_SCHEMA = "event_id long, symbol long, ts timestamp, price double, volume long"


def ticks_df(spark, prices, symbol=1, start_id=0):
    rows = [
        (start_id + i, symbol, BASE + dt.timedelta(minutes=i), float(p), 10 + i)
        for i, p in enumerate(prices)
    ]
    return spark.createDataFrame(rows, TICK_SCHEMA)


@pytest.fixture(scope="module")
def fixture_ticks(spark, sf_dir):
    return finance.ticks_from_events(load_table(spark, sf_dir, "events")).cache()


# --- OHLC -------------------------------------------------------------


def test_ohlc_invariants_on_fixture(fixture_ticks):
    bars = finance.ohlc_bars(fixture_ticks, bucket="1 day").collect()
    assert len(bars) > 0
    for b in bars:
        assert b["low"] <= b["open"] <= b["high"]
        assert b["low"] <= b["close"] <= b["high"]
        assert b["n_trades"] >= 1
        assert b["volume"] >= 0


def test_ohlc_open_close_are_first_last_tick(spark):
    bars = finance.ohlc_bars(
        ticks_df(spark, [5.0, 9.0, 1.0, 7.0]), bucket="1 day"
    ).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b["open"], b["high"], b["low"], b["close"]) == (5.0, 9.0, 1.0, 7.0)
    assert b["n_trades"] == 4
    assert b["volume"] == 10 + 11 + 12 + 13


def test_vwap_weights_by_volume(spark):
    rows = [
        (0, 1, BASE, 10.0, 1),
        (1, 1, BASE + dt.timedelta(minutes=1), 20.0, 3),
    ]
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    out = finance.vwap(df, bucket="1 day").collect()[0]
    assert out["vwap"] == pytest.approx((10.0 * 1 + 20.0 * 3) / 4)
    assert out["total_volume"] == 4


# --- returns / volatility --------------------------------------------


def test_volatility_constant_series_is_zero(spark):
    out = finance.volatility(ticks_df(spark, [50.0] * 30)).collect()[0]
    assert out["volatility"] == 0.0
    assert out["mean_return"] == 0.0
    assert out["n_returns"] == 29


def test_volatility_matches_numpy_on_quantized_returns(spark):
    import numpy as np

    prices = [100.0, 101.0, 99.5, 103.2, 102.8, 104.0, 101.1, 100.9]
    out = finance.volatility(ticks_df(spark, prices)).collect()[0]
    r = np.diff(prices) / np.array(prices[:-1])
    q = np.floor(r * 1e9)  # the operator's documented 1e-9 grid
    rq = q * 1e-9
    assert out["mean_return"] == pytest.approx(rq.mean(), abs=1e-9)
    assert out["volatility"] == pytest.approx(rq.std(ddof=1), rel=1e-6)


def test_volatility_bitwise_stable_under_repartition(fixture_ticks):
    a = finance.volatility(fixture_ticks.repartition(2))
    b = finance.volatility(fixture_ticks.repartition(17))
    va = {r["symbol"]: (r["mean_return"], r["volatility"]) for r in a.collect()}
    vb = {r["symbol"]: (r["mean_return"], r["volatility"]) for r in b.collect()}
    assert va == vb  # exact ==, not approx: quantized-integer accumulation


# --- bollinger --------------------------------------------------------


def test_bollinger_emits_full_frames_only_and_bands_bracket_ma(spark):
    out = finance.bollinger_bands(ticks_df(spark, list(range(1, 31))), n=20).collect()
    assert len(out) == 30 - 19  # first 19 rows lack a full frame
    for r in out:
        assert r["lower_band"] <= r["ma"] <= r["upper_band"]
        assert r["upper_band"] - r["ma"] == pytest.approx(2.0 * r["sd"])


def test_bollinger_constant_series_has_zero_width(spark):
    out = finance.bollinger_bands(ticks_df(spark, [42.0] * 25), n=20).collect()
    for r in out:
        assert r["sd"] == 0.0
        assert r["upper_band"] == r["lower_band"] == r["ma"] == 42.0


# --- RSI --------------------------------------------------------------


def test_rsi_limits_and_flat(spark):
    up = finance.rsi(ticks_df(spark, [float(i) for i in range(1, 20)]), n=14).collect()
    assert all(r["rsi"] == 100.0 for r in up)
    down = finance.rsi(
        ticks_df(spark, [float(i) for i in range(20, 1, -1)]), n=14
    ).collect()
    assert all(r["rsi"] == 0.0 for r in down)
    flat = finance.rsi(ticks_df(spark, [7.0] * 20), n=14).collect()
    assert all(r["rsi"] == 50.0 for r in flat)


def test_rsi_bounded_on_fixture(fixture_ticks):
    rows = finance.rsi(fixture_ticks, n=14).collect()
    assert len(rows) > 0
    assert all(0.0 <= r["rsi"] <= 100.0 for r in rows)
    assert all(r["avg_gain"] >= 0.0 and r["avg_loss"] >= 0.0 for r in rows)


# --- drawdown ---------------------------------------------------------


def test_max_drawdown_known_series(spark):
    # peak 100 → trough 60: dd = 0.4, realized at the 60 tick (idx 3)
    out = finance.max_drawdown(
        ticks_df(spark, [80.0, 100.0, 90.0, 60.0, 95.0])
    ).collect()[0]
    assert out["max_drawdown"] == pytest.approx(0.4)
    assert out["trough_ts"] == BASE + dt.timedelta(minutes=3)


def test_max_drawdown_monotone_rise_is_zero_at_first_tick(spark):
    out = finance.max_drawdown(ticks_df(spark, [1.0, 2.0, 3.0])).collect()[0]
    assert out["max_drawdown"] == 0.0
    # every tick ties at dd=0; the earliest must win deterministically
    assert out["trough_ts"] == BASE


# --- correlation ------------------------------------------------------


def test_pairwise_correlation_perfect_and_anti(spark):
    n = 30
    s1 = ticks_df(spark, [100.0 + i for i in range(n)], symbol=1)
    s2 = ticks_df(spark, [200.0 + 2 * i for i in range(n)], symbol=2, start_id=1000)
    s3 = ticks_df(spark, [300.0 - i for i in range(n)], symbol=3, start_id=2000)
    df = s1.union(s2).union(s3)
    # one tick per (symbol, minute-bucket) → px == price, exact lines
    out = {
        (r["s1"], r["s2"]): r["corr"]
        for r in finance.pairwise_correlation(
            df, bucket="1 minute", min_periods=10
        ).collect()
    }
    assert out[(1, 2)] == pytest.approx(1.0, abs=1e-9)
    assert out[(1, 3)] == pytest.approx(-1.0, abs=1e-9)
    assert out[(2, 3)] == pytest.approx(-1.0, abs=1e-9)


def test_pairwise_correlation_bounded_on_fixture(fixture_ticks):
    rows = finance.pairwise_correlation(
        fixture_ticks, bucket="1 day", min_periods=5
    ).collect()
    assert len(rows) > 0
    for r in rows:
        if r["corr"] is not None:
            assert -1.0 - 1e-12 <= r["corr"] <= 1.0 + 1e-12
        assert r["s1"] < r["s2"]


# --- plan shapes ------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ohlc_is_single_partial_final_aggregation(fixture_ticks):
    plan = _plan(finance.ohlc_bars(fixture_ticks, bucket="1 day"))
    # partial+final hash aggregation, exactly one exchange, no window
    assert plan.count("Exchange hashpartitioning") == 1
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_volatility_agg_reuses_window_partitioning(fixture_ticks):
    plan = _plan(finance.volatility(fixture_ticks))
    # the lag window hash-partitions by symbol; the groupBy(symbol)
    # after it must NOT introduce a second exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_bollinger_single_window_pass(fixture_ticks):
    plan = _plan(finance.bollinger_bands(fixture_ticks))
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_zero_prices_never_fail_the_job(spark):
    """Zero prices occur in real feeds (and the sf0.1 fixture): every
    ratio-based operator must drop the undefined row, not raise ANSI
    DIVIDE_BY_ZERO."""
    prices = [0.0, 0.0, 10.0, 12.0, 0.0, 8.0, 9.0]
    df = ticks_df(spark, prices)
    vol = finance.volatility(df).collect()
    # returns off a zero PREVIOUS price are dropped: (0→0), (0→10),
    # (0→8) gone; 10→12, 12→0 (a valid −100% return), 8→9 kept
    assert vol[0]["n_returns"] == 3
    dd = finance.max_drawdown(df).collect()[0]
    # leading zero-peak rows are undefined; peak 12 -> trough 0 is... the
    # zero tick after 12 realizes dd = 1.0
    assert dd["max_drawdown"] == 1.0
    corr = finance.pairwise_correlation(df, bucket="1 minute", min_periods=1)
    corr.collect()  # single symbol: no pairs, but must not raise
