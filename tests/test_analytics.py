"""Event-analytics entries (gap-fill resample, cohort retention,
funnel): edge-case semantics the fixture oracle can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.operators import finance

BASE = dt.datetime(2024, 3, 1)
TICK_SCHEMA = "event_id long, symbol long, ts timestamp, price double, volume long"


def test_resample_ffill_fills_gaps_and_leading_nulls(spark):
    rows = [
        # symbol 1: trades day 0 and day 2 — day 1 is a gap
        (0, 1, BASE, 10.0, 1),
        (1, 1, BASE + dt.timedelta(days=2), 30.0, 1),
        # symbol 2: first trade on day 2 — days 0-1 have nothing to carry
        (2, 2, BASE + dt.timedelta(days=2), 99.0, 1),
    ]
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    out = {
        (r["symbol"], r["bucket"].day): (r["close_ffill"], r["is_gap"])
        for r in finance.resample_ffill(df, bucket="1 day").collect()
    }
    assert len(out) == 6  # 2 symbols x 3-day corpus spine
    assert out[(1, 1)] == (10.0, False)
    assert out[(1, 2)] == (10.0, True)  # gap carries the previous close
    assert out[(1, 3)] == (30.0, False)
    assert out[(2, 1)] == (None, True)  # nothing to carry before first trade
    assert out[(2, 2)] == (None, True)
    assert out[(2, 3)] == (99.0, False)


def test_funnel_requires_stage_order(spark, sf_dir):
    """A purchase BEFORE the user's first qualifying click must not
    count: rebuild the funnel on a two-user corpus where one user does
    view→click→purchase in order and the other purchases first."""
    from financial_data_stream_processing_engine_spark.plans import catalog

    catalog.load_all()
    rows = [
        (0, BASE + dt.timedelta(minutes=0), 1, "view", 1.0, "{}"),
        (1, BASE + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (2, BASE + dt.timedelta(minutes=2), 1, "purchase", 1.0, "{}"),
        (3, BASE + dt.timedelta(minutes=0), 2, "purchase", 1.0, "{}"),
        (4, BASE + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        (5, BASE + dt.timedelta(minutes=2), 2, "click", 1.0, "{}"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ev = spark.createDataFrame(rows, schema)

    import tempfile

    d = tempfile.mkdtemp(prefix="funnel_fixture_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r["stage"]: r["n_users"]
        for r in catalog.QUERIES["funnel_conversion"].fn(spark, d).collect()
    }
    assert out == {"view": 2, "click": 2, "purchase": 1}


def test_funnel_windowed_horizon_gates_each_stage(spark, sf_dir):
    """The windowed funnel counts a stage only when the canonical
    chain completes within the 3-day horizon of the anchor view:
    user 1 converts fully in-window, user 2's click lands in-window
    but the purchase is a day late, user 3's first click is already
    past the horizon (a later in-window purchase CANNOT rescue it —
    anchors are the earliest-qualifying chain), and the boundary
    user 4 clicks exactly AT t1+3d (inclusive)."""
    from financial_data_stream_processing_engine_spark.plans import catalog

    catalog.load_all()
    rows = [
        (0, BASE, 1, "view", 1.0, "{}"),
        (1, BASE + dt.timedelta(days=1), 1, "click", 1.0, "{}"),
        (2, BASE + dt.timedelta(days=2), 1, "purchase", 1.0, "{}"),
        (3, BASE, 2, "view", 1.0, "{}"),
        (4, BASE + dt.timedelta(days=2), 2, "click", 1.0, "{}"),
        (5, BASE + dt.timedelta(days=4), 2, "purchase", 1.0, "{}"),
        (6, BASE, 3, "view", 1.0, "{}"),
        (7, BASE + dt.timedelta(days=5), 3, "click", 1.0, "{}"),
        (8, BASE + dt.timedelta(days=5, minutes=1), 3, "purchase", 1.0, "{}"),
        (9, BASE, 4, "view", 1.0, "{}"),
        (10, BASE + dt.timedelta(days=3), 4, "click", 1.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    ev = spark.createDataFrame(rows, schema)

    import tempfile

    d = tempfile.mkdtemp(prefix="funnel_win_fixture_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        r["stage"]: (r["n_users"], r["conv_from_first"])
        for r in catalog.QUERIES["funnel_conversion_windowed"].fn(spark, d).collect()
    }
    assert got == {
        "view": (4, 1.0),
        "click": (3, 0.75),  # users 1, 2, 4 (4 exactly at the bound)
        "purchase": (1, 0.25),  # user 1 only
    }


def test_funnel_windowed_matches_reference_on_random_events(spark):
    """Randomized sweep: the windowed funnel's stage counts must match
    a from-scratch Python reference (earliest-qualifying anchor chain,
    then the 3-day horizon predicates) on dense random event logs."""
    import random
    import tempfile

    from financial_data_stream_processing_engine_spark.plans import catalog

    catalog.load_all()
    rng = random.Random(97)
    horizon = dt.timedelta(days=3)
    for _ in range(4):
        rows = []
        for eid in range(rng.randint(20, 80)):
            rows.append(
                (
                    eid,
                    BASE + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 8)),
                    rng.randint(1, 8),
                    rng.choice(("view", "click", "purchase", "other")),
                    1.0,
                    "{}",
                )
            )
        # python reference
        by_user: dict[int, list] = {}
        for eid, ts, uid, et, _v, _p in rows:
            by_user.setdefault(uid, []).append((ts, et))
        n1 = n2 = n3 = 0
        for evs in by_user.values():
            t1 = min((ts for ts, et in evs if et == "view"), default=None)
            if t1 is None:
                continue
            n1 += 1
            t2 = min((ts for ts, et in evs if et == "click" and ts > t1), default=None)
            t3 = (
                min((ts for ts, et in evs if et == "purchase" and ts > t2), default=None)
                if t2 is not None
                else None
            )
            if t2 is not None and t2 <= t1 + horizon:
                n2 += 1
            if t3 is not None and t3 <= t1 + horizon:
                n3 += 1
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
        d = tempfile.mkdtemp(prefix="funnel_win_prop_")
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )
        got = {
            r["stage"]: r["n_users"]
            for r in catalog.QUERIES["funnel_conversion_windowed"].fn(spark, d).collect()
        }
        assert got == {"view": n1, "click": n2, "purchase": n3}


def test_cohort_retention_offsets(spark):
    from financial_data_stream_processing_engine_spark.plans import catalog

    catalog.load_all()
    rows = [
        (0, BASE, 1, "view", 1.0, "{}"),
        (1, BASE + dt.timedelta(days=1), 1, "view", 1.0, "{}"),
        (2, BASE + dt.timedelta(days=1), 2, "view", 1.0, "{}"),
        (3, BASE + dt.timedelta(days=3), 2, "view", 1.0, "{}"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ev = spark.createDataFrame(rows, schema)

    import tempfile

    d = tempfile.mkdtemp(prefix="cohort_fixture_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in catalog.QUERIES["cohort_retention"].fn(spark, d).collect()
    }
    assert out == {
        ("2024-03-01", 0): 1,
        ("2024-03-01", 1): 1,
        ("2024-03-02", 0): 1,
        ("2024-03-02", 2): 1,
    }
