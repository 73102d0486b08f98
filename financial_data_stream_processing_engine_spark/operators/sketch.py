"""Mergeable frequency sketches — the scale-safe siblings of exact
top-k.

Exact per-key counting (``streaming_topk_users``,
``plans/streaming_queries.py``) keeps one state row per distinct key —
fine for 150 users, fatal for 10^9.  A count-min sketch bounds the
state at ``depth × width`` counters REGARDLESS of key cardinality, and
— unlike SpaceSaving/Misra-Gries — its update is a pure SUM, so it is

* **order-independent**: counters are sums of indicator increments, so
  any partitioning / batching / replay order yields the identical
  sketch (bit-for-bit reproducible, driver-oracle-checkable — a
  SpaceSaving summary, by contrast, depends on arrival order);
* **mergeable**: partition-local sketches element-wise add into the
  global one, which is exactly a ``groupBy(depth, pos).count()`` —
  the shuffle carries at most depth·width rows TOTAL at any corpus
  size (the aggregate-to-a-sketch pattern, like ``bloom_build``);
* **streaming-native**: the same groupBy maintains the sketch
  incrementally under Structured Streaming with per-micro-batch
  updates.

Guarantees (standard CM bounds): estimate ≥ true count always (only
overcounts), and with width w the expected overcount is N/w per row of
the sketch — taking the min over ``depth`` independent rows makes a
large overcount exponentially unlikely.  Hash positions derive from
md5(key ∥ salt) like ``dedup._bloom_positions``, so an external engine
can rebuild the *identical* sketch — including identical collisions.

Reference scope: the reference engine (financial_engine.py:283-312)
has no approximate operators at all; this family is driver-contract
surface (SURVEY.md §2 scale patterns / LLM-pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: counters per hash row; 512 keeps the whole sketch ≤ 1536 rows —
#: broadcastable, and N/512 expected overcount per row
CMS_WIDTH = 512
CMS_DEPTH = 3


def _cms_positions(key: Column, depth: int = CMS_DEPTH) -> list[Column]:
    """depth deterministic counter positions: md5(key∥'#c<j>') → first
    8 hex digits → int mod CMS_WIDTH (the Bloom-filter arithmetic,
    re-spelled identically in oracles)."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(key, F.lit(f"#c{j}"))), 1, 8), 16, 10
        ).cast("long")
        % CMS_WIDTH
        for j in range(depth)
    ]


def cms_build(df: DataFrame, key: Column, depth: int = CMS_DEPTH) -> DataFrame:
    """Count-min sketch over ``key`` as a (j, pos, cnt) relation —
    at most depth·width rows, one map-side posexplode + one tiny
    groupBy.  Works identically on a static frame and on a streaming
    one (where the groupBy maintains the counters per micro-batch)."""
    return (
        df.select(F.posexplode(F.array(*_cms_positions(key, depth))).alias("j", "pos"))
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key: Column,
    out_col: str = "est_count",
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Attach the CM estimate (min over the depth counters) to every
    row of ``keys``.  The sketch broadcasts (≤ depth·width rows); the
    probe is a map-side join + a groupBy on the key row — no shuffle
    of the keys beyond their own grouping."""
    probes = keys.select(
        "*", F.posexplode(F.array(*_cms_positions(key, depth))).alias("j", "pos")
    )
    est = F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)
    return (
        probes.join(F.broadcast(sketch), ["j", "pos"], "left")
        .groupBy(*keys.columns)
        .agg(est)
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Keys whose CM estimate ≥ threshold, with the exact count
    alongside as an error audit → (key, est_count, true_count).

    The CM guarantee makes this a NO-FALSE-NEGATIVE heavy-hitter
    report: est ≥ true, so every key with true count ≥ threshold
    appears (possibly plus a few overcounted ones — the audit column
    shows by how much).  ``sketch`` may be passed in (e.g. maintained
    by a streaming query); by default it is built from ``df``.

    Cost at 100 TB: one scan to build the sketch (shuffle ≤ 1536
    rows), one scan for the exact counts of the distinct keys — and
    when key cardinality itself is huge, the true-count audit can be
    dropped and the probe side reduced to candidate keys only.
    """
    key = F.col(key_col).cast("string")
    if sketch is None:
        sketch = cms_build(df, key, depth)
    counts = df.groupBy(key.alias(key_col)).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    est = cms_estimate(counts, sketch, F.col(key_col), depth=depth)
    return est.filter(F.col("est_count") >= threshold).select(
        key_col, "est_count", "true_count"
    )
