"""Edge-case semantics the sf fixtures barely exercise: RANGE-frame
tie handling (value peers share the frame — sf0.01 orders contain
exactly ONE duplicate (status, price) pair, so the oracle's coverage
of peers-included counting is a single data point) and winsorize
boundary behavior (values exactly AT a percentile bound are kept, not
clipped)."""

from __future__ import annotations

import tempfile

from financial_data_stream_processing_engine_spark.plans import catalog


def _run(spark, name, table, rows, schema):
    catalog.load_all()
    d = tempfile.mkdtemp(prefix=f"{name}_fixture_")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{d}/{table}.parquet"
    )
    return catalog.QUERIES[name].fn(spark, d).collect()


def test_range_frame_includes_value_peers(spark):
    """RANGE (unlike ROWS) frames by VALUE: rows tied on the order key
    are peers and every one of them sits in each other's frame — three
    100-priced orders must each count all three, and the frame edge is
    inclusive on both sides (1100 still reaches the 100s; 1101 does
    not)."""
    rows = [
        (1, "O", 100.0),
        (2, "O", 100.0),
        (3, "O", 100.0),
        (4, "O", 500.0),
        (5, "O", 1100.0),
        (6, "O", 1101.0),
        (7, "F", 42.0),
    ]
    got = {
        r["o_orderkey"]: r["n_similar_cheaper"]
        for r in _run(
            spark,
            "window_range_frame",
            "orders",
            rows,
            "o_orderkey long, o_orderstatus string, o_totalprice double",
        )
    }
    assert got == {
        1: 3, 2: 3, 3: 3,  # peers included for every tied row
        4: 4,              # [-500, 500] reaches all three 100s
        5: 5,              # [100, 1100]: inclusive lower edge keeps the 100s
        6: 3,              # [101, 1101]: the 100s fall out
        7: 1,
    }


def test_winsorize_keeps_values_exactly_at_the_bounds(spark):
    """Clipping is strict: a value exactly AT p05 or p95 is inside the
    band (clipped = value < p05 OR value > p95).  21 evenly spaced
    values put the interpolated p05/p95 exactly on 1.0 and 19.0, so
    the boundary rows are decided by the strictness of the predicate,
    not by interpolation noise."""
    rows = [(i, "x", float(i)) for i in range(21)]
    got = {
        r["event_id"]: (r["value_winsorized"], r["clipped"])
        for r in _run(
            spark,
            "winsorize_events_value",
            "events",
            rows,
            "event_id long, event_type string, value double",
        )
    }
    assert got[0] == (1.0, True)    # below p05: clipped up
    assert got[1] == (1.0, False)   # exactly p05: kept
    assert got[19] == (19.0, False) # exactly p95: kept
    assert got[20] == (19.0, True)  # above p95: clipped down
    assert all(not c for i, (_v, c) in got.items() if 1 <= i <= 19)


def test_range_bands_are_halfopen_and_exhaustive_only_inside(spark):
    """Band membership is lo ≤ x < hi: a price exactly at a shared
    boundary (935.0) belongs to the UPPER band only (no double count),
    and prices outside every band (899.99, 1000.0) drop out of the
    join entirely — the inner-join-as-filter semantics."""
    prices = [900.0, 934.99, 935.0, 969.99, 970.0, 999.99, 1000.0, 899.99]
    rows = [(i, float(p)) for i, p in enumerate(prices)]
    got = {
        r["band"]: r["n_parts"]
        for r in _run(
            spark,
            "join_range_price_bands",
            "part",
            rows,
            "p_partkey long, p_retailprice double",
        )
    }
    assert got == {"low": 2, "mid": 2, "high": 2}  # 1000.0 and 899.99 dropped
