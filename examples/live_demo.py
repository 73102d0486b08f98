"""Run the live engine for a fixed duration — the Spark-first
equivalent of the reference demo's ``main_simulation``
(financial_engine.py:418-448).

Starts the WebSocket-mock and CSV-replay streams (pass an AlphaVantage
API key via ``ALPHAVANTAGE_API_KEY`` to add the live poller), runs the
clean → shared-state moving-average pipeline, prints alerts and epoch
logs for ``--seconds``, then stops cleanly.

Usage::

    python examples/live_demo.py --seconds 30
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from financial_data_stream_processing_engine_spark import LiveEngine, get_spark
from financial_data_stream_processing_engine_spark.sources.alpha_vantage import AlphaVantageSource


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    args = ap.parse_args()

    spark = get_spark("live-demo")
    api_key = os.environ.get("ALPHAVANTAGE_API_KEY")
    av = AlphaVantageSource(api_key=api_key) if api_key else None

    engine = LiveEngine(
        spark,
        av_source=av,
        on_alert=lambda rows, n_suppressed: print(
            f"[ALERT] {len(rows)} row(s) (+{n_suppressed} suppressed), e.g. {rows[0]}"
        ),
        logger=lambda line: print(f"[LOG] {line}"),
        enable_console=False,
    )
    engine.run_for(args.seconds)
    print(f"processed rows retained for inspection: {len(engine.recent)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
