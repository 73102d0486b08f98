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


# ---------------------------------------------------------------------------
# HyperLogLog (from scratch, engine-exact)
# ---------------------------------------------------------------------------

#: 2^8 = 256 registers — the classic p=8 HLL (≈6.5% standard error);
#: register state is ≤256 rows at ANY cardinality
HLL_P = 8
HLL_M = 1 << HLL_P

#: bias-correction constant α_m for m=256, computed once in Python and
#: injected as the identical double literal into both engines
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_build(df: DataFrame, key: Column) -> DataFrame:
    """HyperLogLog registers over ``key`` as a (bucket, m_j) relation.

    The 32-bit hash comes from md5(key∥'#h') like the CMS/Bloom
    positions; the top p bits pick the register, and ρ = leading-zero
    count of the remaining 24 bits + 1 (spelled as 25 − LENGTH(bin(w)),
    identical in Spark and DuckDB — verified: both render minimal-width
    binary).  Registers are a MAX aggregation → order-independent and
    mergeable, so the sketch is bit-identical at any parallelism and
    under streaming micro-batch updates, like :func:`cms_build`.
    """
    h = F.conv(F.substring(F.md5(F.concat(key, F.lit("#h"))), 1, 8), 16, 10).cast(
        "long"
    )
    w = h % F.lit(1 << 24)
    rho = F.when(w == 0, F.lit(25)).otherwise(F.lit(25) - F.length(F.bin(w)))
    return (
        df.select(
            F.shiftright(h, 24).alias("bucket"), rho.cast("int").alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row HLL cardinality report with an exact-count audit →
    (n_buckets, nonzero_buckets, harmonic_sum, hll_estimate,
    true_distinct).

    The harmonic sum Σ 2^−M_j is a sum of dyadic rationals with
    exponents ≥ −25 — EXACT in double and order-independent, so the
    raw HLL estimate α·m²/S is deterministic and engine-identical (no
    float-summation hazard).  The small/large-range corrections are
    deliberately left to the consumer: they need ln(), whose last-ulp
    behavior is not guaranteed identical across engines, and the
    report carries nonzero_buckets so linear counting can be applied
    downstream.  true_distinct is the audit column (drop it at real
    scale — it is the expensive exact path this sketch replaces).
    """
    key = F.col(key_col).cast("string")
    reg = hll_build(df, key)
    sketch_stats = reg.agg(
        F.count(F.lit(1)).alias("nonzero_buckets"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("__s_nonzero"),
    )
    exact = df.agg(F.count_distinct(key).alias("true_distinct"))
    s = (F.lit(float(HLL_M)) - F.col("nonzero_buckets")) + F.col("__s_nonzero")
    est = F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / s
    return (
        sketch_stats.crossJoin(exact)
        .select(
            F.lit(HLL_M).alias("n_buckets"),
            "nonzero_buckets",
            s.alias("harmonic_sum"),
            est.alias("hll_estimate"),
            # raw-HLL is biased below 2.5m — this flag says "apply
            # linear counting m·ln(m/empty) downstream" (the ln itself
            # is left out: last-ulp ln behavior is engine-specific)
            (est <= F.lit(2.5 * HLL_M)).alias("small_range"),
            "true_distinct",
        )
    )


# ---------------------------------------------------------------------------
# Log-linear histogram quantiles (HdrHistogram-style, engine-exact)
# ---------------------------------------------------------------------------

#: linear sub-buckets per octave: 2^4 = 16 → ≤ 2^-4 = 6.25% relative
#: error, ~16 buckets per power of two of dynamic range
HDR_SUBBITS = 4


def hdr_bucket_and_floor(v: Column) -> tuple[Column, Column]:
    """(bucket id, bucket lower bound) for a POSITIVE integer value.

    HdrHistogram's log-linear grid in pure integer arithmetic: the
    octave is the MSB position p = LENGTH(bin(v)) and the sub-bucket
    is the next ``HDR_SUBBITS`` bits, so every bucket spans a 2^-4
    slice of its octave.  Values below 2^(SUBBITS+1) are their own
    bucket (exact).  Everything is integer shifts/divides with
    power-of-two doubles in between — bit-identical in Spark and
    DuckDB, unlike t-digest (RNG-free but merge-order-dependent) or
    anything involving ln().
    """
    p = F.length(F.bin(v))
    small = p <= HDR_SUBBITS + 1
    scale = F.pow(F.lit(2.0), (p - HDR_SUBBITS - 1).cast("double"))
    sub = F.floor(v / scale).cast("long")  # in [2^SUBBITS, 2^(SUBBITS+1))
    bucket = F.when(small, v).otherwise(
        F.shiftleft(p.cast("long"), HDR_SUBBITS) + sub - F.lit(1 << HDR_SUBBITS)
    )
    floor_ = F.when(small, v).otherwise((sub * scale).cast("long"))
    return bucket, floor_


def hdr_histogram(df: DataFrame, v: Column) -> DataFrame:
    """Log-linear histogram over positive integer ``v`` → (bucket,
    floor, cnt).  ~16 rows per octave of dynamic range regardless of
    data size (64-bit values ⇒ ≤ ~1000 buckets): the quantile sibling
    of :func:`cms_build`/:func:`hll_build` — a pure COUNT aggregation,
    order-independent, mergeable, streaming-native, and the shuffle
    carries only the bucket rows."""
    bucket, floor_ = hdr_bucket_and_floor(v)
    return (
        df.select(bucket.alias("bucket"), floor_.alias("floor"))
        .groupBy("bucket")
        .agg(F.min("floor").alias("floor"), F.count(F.lit(1)).alias("cnt"))
    )


def hdr_quantile_report(
    df: DataFrame,
    value: Column,
    qs: tuple[float, ...] = (0.25, 0.5, 0.95, 0.99),
    scale: int = 100,
) -> DataFrame:
    """Quantile estimates from the histogram, with the exact
    interpolated percentile as an audit → (q, est, exact) per quantile.

    ``value`` is quantized to an integer grid (``scale`` = units per
    1.0, e.g. cents) with round-half-up; the estimate for quantile q
    is the LOWER BOUND of the bucket holding the ceil(q·N)-th ranked
    value — a one-sided estimate with guaranteed relative error
    ≤ 2^-HDR_SUBBITS (6.25%), documented rather than probabilistic.
    The rank walk is a cumulative sum over ≤~1000 bucket rows (the
    single-partition window is over the SKETCH, never the data).
    """
    from pyspark.sql import Window

    v = F.floor(value * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    base = df.select(value.alias("__val"), v.alias("__v")).filter(F.col("__v") > 0)
    hist = hdr_histogram(base, F.col("__v"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    total = hist.agg(F.sum("cnt").alias("__N"))
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(total)
    )
    exacts = base.agg(
        *[
            F.percentile("__val", F.lit(q)).alias(f"__x{i}")
            for i, q in enumerate(qs)
        ]
    )
    parts = []
    for i, q in enumerate(qs):
        rank = F.ceil(F.lit(q) * F.col("__N"))
        est = (
            cum.filter(F.col("cum") >= rank)
            .orderBy("bucket")
            .limit(1)
            .select(
                F.lit(f"{q}").alias("q"),
                (F.col("floor") / F.lit(float(scale))).alias("est"),
            )
        )
        parts.append(
            est.crossJoin(exacts.select(F.col(f"__x{i}").alias("exact")))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
