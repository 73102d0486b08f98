"""Live AlphaVantage GLOBAL_QUOTE poller (demo source, S1).

Reference: financial_engine.py:124-209.  The reference polls one
symbol per interval, round-robin over the configured list (:160), and
returns nothing on missing/garbled quotes or the API-limit "Note"
payload (:171-184).  The *query semantics* live entirely in
``normalize_alpha_vantage`` (tested in batch); this module is the thin
network seam, kept injectable so tests drive it with canned payloads
and no live demo is needed for correctness.

Usage (live)::

    src = AlphaVantageSource(api_key="...", symbols=("IBM", "MSFT"))
    raw = src.poll_batch(spark, n_polls=4)     # one row per successful poll
    ticks = normalize_alpha_vantage(raw)

Network access uses stdlib urllib only and is exercised nowhere in the
test/bench path.
"""

from __future__ import annotations

import itertools
import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession, types as T

from financial_data_stream_processing_engine_spark.sources.batch import AV_PRICE, AV_SYMBOL, AV_VOLUME

GLOBAL_QUOTE_URL = (
    "https://www.alphavantage.co/query?function=GLOBAL_QUOTE&symbol={symbol}&apikey={key}"
)

RAW_SCHEMA = T.StructType(
    [
        T.StructField(AV_SYMBOL, T.StringType()),
        T.StructField(AV_PRICE, T.StringType()),
        T.StructField(AV_VOLUME, T.StringType()),
        # per-poll client-side arrival instant (reference stamps
        # time.time() per fetch, :191); without it a whole batch of
        # polls would share one current_timestamp() and the row-count
        # window would order equal-ts rows by random uuid.
        T.StructField("arrival", T.TimestampType()),
    ]
)


def _default_fetch(url: str, timeout_s: float) -> dict:
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


class AlphaVantageSource:
    """Round-robin GLOBAL_QUOTE poller with an injectable fetcher."""

    def __init__(
        self,
        api_key: str,
        symbols: tuple[str, ...] = ("IBM", "MSFT", "AAPL", "GOOGL"),
        fetch: Callable[[str, float], dict] | None = None,
        timeout_s: float = 10.0,
    ) -> None:
        self.api_key = api_key
        self.symbols = symbols
        self._cycle = itertools.cycle(symbols)  # round-robin (:160)
        self._fetch = fetch or _default_fetch
        self.timeout_s = timeout_s

    def poll_once(self) -> dict | None:
        """One poll of the next symbol; None on any malformed payload.

        Mirrors the reference's defensive paths (:171-184): missing
        'Global Quote' block, empty quote, missing PRICE or VOLUME
        field (:182 — the symbol is deliberately never checked), or
        the rate-limit 'Note' payload all yield None rather than
        raising.
        """
        symbol = next(self._cycle)
        url = GLOBAL_QUOTE_URL.format(symbol=symbol, key=self.api_key)
        try:
            payload = self._fetch(url, self.timeout_s)
        except Exception:
            return None
        if not isinstance(payload, dict) or "Note" in payload:
            return None
        quote = payload.get("Global Quote")
        if not isinstance(quote, dict) or not quote:
            return None
        row = {k: quote.get(k) for k in (AV_SYMBOL, AV_PRICE, AV_VOLUME)}
        # the reference checks PRICE and VOLUME presence (:182), never
        # the symbol — a missing-symbol quote is emitted with
        # symbol=None and survives the downstream pipeline untouched
        if row[AV_PRICE] is None or row[AV_VOLUME] is None:
            return None
        import datetime as dt

        # tz-AWARE: a naive datetime is interpreted in the driver's
        # LOCAL timezone by createDataFrame (time.mktime), shifting the
        # stored instant by the UTC offset on non-UTC machines and
        # skewing cross-source arrival ordering
        row["arrival"] = dt.datetime.now(tz=dt.timezone.utc)
        return row

    def iter_polls(self, n_polls: int) -> Iterator[dict]:
        for _ in range(n_polls):
            row = self.poll_once()
            if row is not None:
                yield row

    def poll_batch(self, spark: SparkSession, n_polls: int) -> DataFrame:
        """n_polls round-robin polls → raw-shape DataFrame.

        Normalize with the per-poll arrival instants so the row-count
        window orders polls by true arrival::

            normalize_alpha_vantage(raw, ts_expr=F.col("arrival"))
        """
        rows = list(self.iter_polls(n_polls))
        return spark.createDataFrame(rows, RAW_SCHEMA)
