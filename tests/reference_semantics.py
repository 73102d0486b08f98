"""Pure-Python golden oracle for the reference-compat core.

A ~25-line reimplementation of the reference pipeline's semantics
(clean → per-key row-count moving average → alert; reference
financial_engine.py:283-312, :97-110) used to compute expected outputs
for hand-written tick sequences (SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

from collections import defaultdict, deque


def reference_pipeline(rows, n=5, threshold=108.0):
    """rows: list of dicts with symbol/price/volume keys, in arrival order."""
    hist = defaultdict(lambda: deque(maxlen=n))
    out = []
    for r in rows:
        price = r.get("price")
        if price is None or price <= 0:  # DataCleaner drop (:287-289)
            continue
        r = dict(r)
        volume = r.get("volume", 0)  # the 0 default covers a MISSING key
        if volume is None:
            # max(0, None) raises TypeError; _run_pipeline's per-row
            # isolation drops the row (:290, :358-365)
            continue
        r["volume"] = max(0, volume)  # clamp after filter (:290)
        ma = None
        symbol = r.get("symbol")
        if symbol:  # TRUTHINESS (:303): None and '' both skip state
            h = hist[symbol]
            h.append(price)
            if len(h) == n:  # emit only at exactly-full window (:308)
                ma = sum(h) / n
        r["moving_average"] = ma
        r["alert"] = bool(ma is not None and ma > threshold)  # (:104)
        out.append(r)
    return out
