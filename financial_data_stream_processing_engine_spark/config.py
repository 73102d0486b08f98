"""Engine configuration.

Typed replacement for the reference's ConfigurationManager singleton
(reference: financial_engine.py:20-56).  The reference keeps a global
string->value dict; here configuration is an immutable dataclass passed
explicitly, plus a ``spark.conf`` namespace (``engine.*``) for values
that must be visible inside Spark jobs.

Reference config keys preserved (financial_engine.py:25-42):
  moving_average_window=5, price_alert_threshold=108.0, log_level,
  per-source fetch intervals.  ``processing_delay_ms`` is a simulation
  artifact and intentionally dropped (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SourceConfig:
    """Per-source polling configuration (demo/live sources only)."""

    name: str
    interval_s: float


@dataclass(frozen=True)
class EngineConfig:
    """Global engine configuration.

    Defaults mirror the reference's ConfigurationManager defaults
    (financial_engine.py:25-42) so the compat core reproduces the same
    behavior out of the box.
    """

    moving_average_window: int = 5
    price_alert_threshold: float = 108.0
    log_level: str = "INFO"
    symbols: tuple[str, ...] = ("IBM", "MSFT", "AAPL", "GOOGL")
    sources: tuple[SourceConfig, ...] = field(
        default_factory=lambda: (
            SourceConfig("AlphaVantage", 15.0),
            SourceConfig("WebSocketMock", 0.5),
            SourceConfig("CSVMock", 2.0),
        )
    )
    # Scale knobs (not in the reference — 100 TB discipline, SURVEY.md §7):
    #: state TTL for streaming keyed state; the reference leaks state for
    #: unbounded key sets (financial_engine.py:298), we bound it.
    #: ``None`` disables the timeout (synchronous tests: with a
    #: processing-time timeout the engine schedules continuous empty
    #: micro-batches and processAllAvailable never settles).
    state_ttl_ms: int | None = 24 * 3600 * 1000
    #: shuffle partitions for local runs; on a real cluster leave to AQE.
    shuffle_partitions: int = 32


DEFAULT_CONFIG = EngineConfig()
