"""End-to-end test of the live orchestrator (E1).

Drives LiveEngine exactly like the reference's main_simulation
(financial_engine.py:435-448) but with a canned AlphaVantage fetcher —
no network — and asserts the reference's observable behavior: all three
sources flow through ONE pipeline, the shared moving average fires
alerts above the threshold, and the logging observer sees epochs.

Note: no processAllAvailable here — rate sources generate continuously,
so a synchronous drain never settles; the test polls the observers
while the engine free-runs, which is exactly how the reference's demo
behaves.
"""

from __future__ import annotations

import dataclasses
import time

import pytest

from financial_data_stream_processing_engine_spark.config import DEFAULT_CONFIG, SourceConfig
from financial_data_stream_processing_engine_spark.engine import LiveEngine
from financial_data_stream_processing_engine_spark.sources.alpha_vantage import AlphaVantageSource

pytestmark = pytest.mark.usefixtures("spark")


def _canned_fetch(url: str, timeout_s: float) -> dict:
    # valid GLOBAL_QUOTE payload; price above the 108.0 alert threshold
    # so AV rows participate in alerting once the window fills
    sym = "IBM" if "symbol=IBM" in url else "MSFT"
    return {
        "Global Quote": {
            "01. symbol": sym,
            "05. price": "200.10",
            "06. volume": "1234",
        }
    }


def test_live_engine_end_to_end(spark, tmp_path):
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        state_ttl_ms=None,
        # WS symbols disjoint from the canned AV symbols (IBM/MSFT):
        # MA state is shared across sources per symbol (U1), so a WS
        # row on IBM would legitimately inherit AV's high average and
        # alert with source=WebSocketMock.
        symbols=("EURUSD", "GBPUSD", "USDJPY"),
        sources=(
            SourceConfig("AlphaVantage", 0.05),
            SourceConfig("WebSocketMock", 0.0),
            SourceConfig("CSVMock", 0.0),
        ),
    )
    alerts: list = []
    logs: list[str] = []
    engine = LiveEngine(
        spark,
        config=cfg,
        av_source=AlphaVantageSource(api_key="test", fetch=_canned_fetch),
        on_alert=alerts.extend,
        logger=logs.append,
        ws_rows_per_second=50,
        csv_rows_per_second=50,
    )
    engine.start(checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 120
        want = {"WebSocketMock", "CSVMock", "AlphaVantage"}
        while time.time() < deadline:
            if want <= {r["source"] for r in engine.recent} and alerts:
                break
            time.sleep(0.5)
    finally:
        engine.stop()

    sources_seen = {r["source"] for r in engine.recent}
    assert want <= sources_seen, f"sources seen: {sources_seen}"
    # alert observer: only rows whose shared-state MA cleared the bar
    assert alerts, "no alerts fired"
    assert all(r["moving_average"] > cfg.price_alert_threshold for r in alerts)
    # CSV mock prices (205..880) and the canned AV price (200.10) alert;
    # WS mock prices (1..101) never can
    assert all(r["source"] in ("CSVMock", "AlphaVantage") for r in alerts)
    # logging observer saw epochs (INFO level)
    assert any(l.startswith("epoch=") for l in logs)
    # lifecycle: stop() is idempotent and the query is gone
    engine.stop()
    assert engine.query is None


def test_live_engine_log_level_gates_logging(spark):
    cfg = dataclasses.replace(DEFAULT_CONFIG, state_ttl_ms=None, log_level="ERROR")
    logs: list[str] = []
    engine = LiveEngine(
        spark, config=cfg, logger=logs.append, ws_rows_per_second=20,
        csv_rows_per_second=20,
    )
    engine.start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not engine.recent:
            time.sleep(0.5)
    finally:
        engine.stop()
    assert engine.recent, "engine produced no rows"
    assert logs == []  # LoggingModule is level-gated (reference :93)
