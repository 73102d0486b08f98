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
        # a NULL key would emit a (bucket=NULL, m_j=NULL) register row
        # that inflates nonzero_buckets but adds nothing to the
        # harmonic sum, losing one empty-bucket term — NULL is not a
        # value, matching count_distinct (the audit column)
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_report(
    df: DataFrame, key_col: str, registers: DataFrame | None = None
) -> DataFrame:
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

    ``registers`` may be passed in (e.g. maintained incrementally by a
    streaming query — MAX registers are order-independent, so the
    streamed table is bit-identical to the batch build); by default
    they are built from ``df``.
    """
    key = F.col(key_col).cast("string")
    reg = registers if registers is not None else hll_build(df, key)
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
    hist: DataFrame | None = None,
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

    ``hist`` may be passed in (e.g. maintained incrementally by a
    streaming query — the bucket rows are MIN/COUNT aggregations,
    order-independent and mergeable, so the streamed histogram is
    bit-identical to the batch build); by default it is built from
    ``df`` with the identical ``floor(value·scale + 0.5)``
    quantization the caller must replicate.
    """
    from pyspark.sql import Window

    v = F.floor(value * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    base = df.select(value.alias("__val"), v.alias("__v")).filter(F.col("__v") > 0)
    if hist is None:
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


# ---------------------------------------------------------------------------
# K-minimum-values (KMV) distinct sketch with set-operation estimates
# ---------------------------------------------------------------------------

#: sketch size: k smallest distinct hash values are kept per set —
#: relative error ~1/sqrt(k-2) ≈ 6.3%, state ≤ k rows per set at ANY
#: cardinality (the theta-sketch / KMV family: Bar-Yossef et al.,
#: Beyer et al. "distinct-value synopses for set operations")
KMV_K = 256

#: hash range: md5-derived 32-bit uniform values live in [0, 2^32)
KMV_RANGE = float(1 << 32)


def kmv_hash(key: Column) -> Column:
    """32-bit uniform hash for the KMV order statistics: md5(key∥'#v')
    first 8 hex digits → long — the Bloom/CMS/HLL arithmetic with its
    own salt, so an external engine rebuilds the identical sketch."""
    return F.conv(F.substring(F.md5(F.concat(key, F.lit("#v"))), 1, 8), 16, 10).cast(
        "long"
    )


def kmv_sketch(tagged: DataFrame, tag_col: str, key: Column, k: int = KMV_K) -> DataFrame:
    """Per-tag KMV sketch → (tag, h): the ``k`` SMALLEST DISTINCT hash
    values of each tagged key set.

    One distinct-shuffle over (tag, hash) — 12 bytes/row regardless of
    key width — then a rank-limit window that Spark executes as
    WindowGroupLimit: each partition keeps only its local top-k before
    the exchange, so the shuffle after the distinct carries ≤ k rows
    per partition per tag.  State is ≤ k rows per set at any
    cardinality.
    """
    from pyspark.sql import Window

    # NULL keys hash to NULL, which Spark's ascending sort puts FIRST:
    # left in, a NULL would take rank 1 and displace a real minimum
    # hash (cnt counts it, max('h') ignores it — inconsistent
    # estimates).  NULL is excluded, matching count_distinct.
    hashes = (
        tagged.select(F.col(tag_col).alias("tag"), kmv_hash(key).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("tag").orderBy("h")
    return (
        hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("tag", "h")
    )


def _kmv_est(cnt: Column, hk: Column, k: int) -> Column:
    """(k−1)/h₍k₎ estimator, degrading to the exact retained count when
    the sketch holds the whole set (cnt < k).  One integer-exact
    multiply + one IEEE division — engine-identical."""
    return F.when(cnt < F.lit(k), cnt.cast("double")).otherwise(
        F.lit(float(k - 1) * KMV_RANGE) / hk.cast("double")
    )


def kmv_setops_report(
    tagged: DataFrame, tag_col: str, key: Column, k: int = KMV_K
) -> DataFrame:
    """One-row |A|, |B|, |A∪B|, |A∩B| estimate report from two KMV
    sketches, with exact audits → (k, est_a, est_b, est_union,
    est_intersect, true_a, true_b, true_union, true_intersect).

    ``tagged`` carries (tag ∈ {'a','b'}, key).  The union sketch is the
    k smallest of the merged sketch hashes (KMV merge = union + re-top-k);
    the intersection uses the standard ratio estimator
    ρ·|A∪B| where ρ = |K_∪ ∩ A ∩ B| / |K_∪| — membership checked
    against the per-set sketches, which is exact for hashes inside K_∪
    (any A-hash ≤ the kth union value is necessarily among A's k
    smallest).  Everything after the per-set distinct is sketch-sized
    (≤ 2k rows): the one unpartitioned window runs over the SKETCH,
    never the data.  The exact audits cost one more distinct over the
    tagged keys — drop them at real scale.
    """
    from pyspark.sql import Window

    sk = kmv_sketch(tagged, tag_col, key, k).localCheckpoint(eager=False)
    per = (
        sk.groupBy("tag")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("h").alias("hk"))
        .select("tag", _kmv_est(F.col("cnt"), F.col("hk"), k).alias("est"))
    )
    # global agg, NOT filter→select: a tag absent from the input would
    # make a filtered frame EMPTY and the crossJoin chain below would
    # annihilate the whole report — a keys=[] aggregate always yields
    # exactly one row, estimating 0 for the missing set
    est_a = per.filter(F.col("tag") == "a").agg(
        F.coalesce(F.first("est"), F.lit(0.0)).alias("est_a")
    )
    est_b = per.filter(F.col("tag") == "b").agg(
        F.coalesce(F.first("est"), F.lit(0.0)).alias("est_b")
    )
    wu = Window.orderBy("h")  # over ≤ 2k sketch rows
    ku = (
        sk.select("h")
        .distinct()
        .withColumn("__rn", F.row_number().over(wu))
        .filter(F.col("__rn") <= k)
        .select("h")
        .localCheckpoint(eager=False)
    )
    u = ku.agg(F.count(F.lit(1)).alias("cnt_u"), F.max("h").alias("hk_u"))
    both = (
        ku.join(sk.filter(F.col("tag") == "a").select("h"), "h", "semi")
        .join(sk.filter(F.col("tag") == "b").select("h"), "h", "semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    # exact audits in ONE wide shuffle: per-key tag flags via a single
    # groupBy (map-side combine), then the four counts in one 1-row agg
    # (replacing a distinct + a re-groupBy + a per-tag count — the
    # audit is the expensive exact path the sketch replaces; drop it
    # at real scale)
    # NULL keys excluded like the sketch path (and like
    # count_distinct), so the audit counts the same universe
    ex = tagged.where(key.isNotNull()).groupBy(key.alias("__k")).agg(
        F.max(F.col(tag_col) == "a").alias("__ha"),
        F.max(F.col(tag_col) == "b").alias("__hb"),
    )
    audits = ex.agg(
        F.count_if(F.col("__ha")).alias("true_a"),
        F.count_if(F.col("__hb")).alias("true_b"),
        F.count(F.lit(1)).alias("true_union"),
        F.count_if(F.col("__ha") & F.col("__hb")).alias("true_intersect"),
    )
    est_union = _kmv_est(F.col("cnt_u"), F.col("hk_u"), k)
    row = (
        u.crossJoin(F.broadcast(both))
        .crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(audits))
    )
    return row.select(
        F.lit(k).alias("k"),
        "est_a",
        "est_b",
        est_union.alias("est_union"),
        # try_divide: a fully-empty input has cnt_u = 0, and a plain
        # ANSI division would fail the job on the degenerate case
        F.try_divide(F.col("n_both") * est_union, F.col("cnt_u")).alias(
            "est_intersect"
        ),
        "true_a",
        "true_b",
        "true_union",
        "true_intersect",
    )
