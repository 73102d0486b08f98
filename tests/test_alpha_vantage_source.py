"""AlphaVantage poller seam tests: canned payloads, no network."""

from __future__ import annotations

from financial_data_stream_processing_engine_spark.sources.alpha_vantage import AlphaVantageSource
from financial_data_stream_processing_engine_spark.sources.batch import normalize_alpha_vantage


def quote(symbol: str, price: str, volume: str) -> dict:
    return {
        "Global Quote": {
            "01. symbol": symbol,
            "05. price": price,
            "06. volume": volume,
        }
    }


def test_round_robin_and_normalization(spark):
    calls = []

    def fake_fetch(url: str, timeout_s: float) -> dict:
        sym = url.split("symbol=")[1].split("&")[0]
        calls.append(sym)
        return quote(sym, "101.50", "4200")

    src = AlphaVantageSource("k", symbols=("IBM", "MSFT"), fetch=fake_fetch)
    raw = src.poll_batch(spark, n_polls=4)
    # round-robin over the symbol list (reference financial_engine.py:160)
    assert calls == ["IBM", "MSFT", "IBM", "MSFT"]

    ticks = normalize_alpha_vantage(raw).collect()
    assert len(ticks) == 4
    assert {t.symbol for t in ticks} == {"IBM", "MSFT"}
    assert all(t.price == 101.5 and t.volume == 4200 for t in ticks)
    assert all(t.source == "AlphaVantage" for t in ticks)


def test_defensive_drops(spark):
    payloads = iter(
        [
            {"Note": "API limit reached"},          # rate-limit → drop
            {},                                      # missing block → drop
            {"Global Quote": {}},                    # empty quote → drop
            {"Global Quote": {"01. symbol": "IBM"}}, # missing price → drop
            quote("IBM", "99.0", "10"),              # good
            ValueError("network down"),              # exception → drop
        ]
    )

    def fake_fetch(url: str, timeout_s: float) -> dict:
        p = next(payloads)
        if isinstance(p, Exception):
            raise p
        return p

    src = AlphaVantageSource("k", symbols=("IBM",), fetch=fake_fetch)
    rows = list(src.iter_polls(6))
    assert len(rows) == 1 and rows[0]["05. price"] == "99.0"
