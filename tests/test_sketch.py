"""Count-min sketch guarantees (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators import sketch


def test_cms_never_undercounts_and_has_no_false_negatives(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hh = sketch.heavy_hitters(ev, "user_id", threshold=0).collect()
    # est >= true for EVERY key — the one-sided CM guarantee
    assert all(r.est_count >= r.true_count for r in hh)
    # no false negatives at any threshold: every truly-heavy key reported
    thr = 50
    reported = {r.user_id for r in hh if r.est_count >= thr}
    truly = {
        str(r.user_id)
        for r in ev.groupBy("user_id").count().filter(F.col("count") >= thr).collect()
    }
    assert truly <= reported


def test_cms_sketch_order_independent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    a = {(r.j, r.pos): r.cnt for r in sketch.cms_build(ev.repartition(2), key).collect()}
    b = {(r.j, r.pos): r.cnt for r in sketch.cms_build(ev.repartition(17), key).collect()}
    assert a == b
    assert len(a) <= sketch.CMS_DEPTH * sketch.CMS_WIDTH


def test_hll_registers_order_independent_and_bounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")
    a = {r.bucket: r.m_j for r in sketch.hll_build(ev.repartition(2), key).collect()}
    b = {r.bucket: r.m_j for r in sketch.hll_build(ev.repartition(19), key).collect()}
    assert a == b
    assert len(a) <= sketch.HLL_M
    assert all(1 <= v <= 25 for v in a.values())


def test_hll_estimate_tracks_cardinality(spark, sf_dir):
    import math

    ev = load_table(spark, sf_dir, "events")
    # few distinct users → the report must flag the small-range regime,
    # and the documented consumer-side correction (linear counting
    # m·ln(m/empty) off nonzero_buckets) must land near the truth
    small = sketch.hll_report(ev, "user_id").collect()[0]
    assert small.small_range
    lc = sketch.HLL_M * math.log(
        sketch.HLL_M / (sketch.HLL_M - small.nonzero_buckets)
    )
    assert abs(lc - small.true_distinct) <= 0.2 * small.true_distinct + 3
    # high cardinality (every event id distinct) → the RAW estimate is
    # the operative one and must sit inside the ±3σ envelope of the
    # 1.04/√m standard error
    big = sketch.hll_report(ev, "event_id").collect()[0]
    sigma = 1.04 / math.sqrt(sketch.HLL_M)
    assert (
        abs(big.hll_estimate - big.true_distinct)
        <= 3 * sigma * big.true_distinct
    )


def test_hdr_quantile_one_sided_error_bound(spark, sf_dir):
    """The histogram estimate is the bucket lower bound: est ≤ the true
    value, and within the documented 2^-HDR_SUBBITS relative error."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    rows = sketch.hdr_quantile_report(
        orders, F.col("o_totalprice"), qs=(0.1, 0.5, 0.9, 0.99)
    ).collect()
    assert len(rows) == 4
    for r in rows:
        # quantization to cents can nudge by ±0.005 either way
        assert r.est <= r.exact + 0.01, r
        assert r.exact <= r.est * (1 + 2.0 ** -sketch.HDR_SUBBITS) + 0.01, r


def test_hdr_histogram_order_independent_and_small(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    v = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    a = {
        (r.bucket, r.floor): r.cnt
        for r in sketch.hdr_histogram(orders.repartition(3), v).collect()
    }
    b = {
        (r.bucket, r.floor): r.cnt
        for r in sketch.hdr_histogram(orders.repartition(11), v).collect()
    }
    assert a == b
    assert len(a) < 1000  # bounded rows at any data size


def test_kmv_estimates_within_error_bounds(spark, sf_dir):
    """KMV (k−1)/h₍k₎ estimates for |A|, |B|, |A∪B|, |A∩B| land within
    the ~1/√(k−2) relative-error envelope (3σ) of the exact audits."""
    import math

    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.lit("a").alias("tag"), F.col("l_orderkey")
    )
    b = li.filter(F.col("l_quantity") > 25).select(
        F.lit("b").alias("tag"), F.col("l_orderkey")
    )
    r = sketch.kmv_setops_report(
        a.unionByName(b), "tag", F.col("l_orderkey").cast("string"), k=256
    ).collect()[0]
    tol = 3 * (1.0 / math.sqrt(256 - 2))
    assert abs(r.est_a - r.true_a) <= tol * r.true_a + 2
    assert abs(r.est_b - r.true_b) <= tol * r.true_b + 2
    assert abs(r.est_union - r.true_union) <= tol * r.true_union + 2
    # intersection compounds union + ratio noise — allow 2× the envelope
    assert abs(r.est_intersect - r.true_intersect) <= 2 * tol * r.true_intersect + 4


def test_kmv_sketch_order_independent_and_bounded(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(F.lit("a").alias("tag"), F.col("l_orderkey"))
    key = F.col("l_orderkey").cast("string")
    a = {r.h for r in sketch.kmv_sketch(tagged.repartition(2), "tag", key).collect()}
    b = {r.h for r in sketch.kmv_sketch(tagged.repartition(13), "tag", key).collect()}
    assert a == b
    assert len(a) <= sketch.KMV_K


def test_kmv_small_set_degrades_to_exact(spark):
    rows = [("a", f"k{i}") for i in range(40)] + [("b", f"k{i}") for i in range(20, 70)]
    df = spark.createDataFrame(rows, "tag string, k string")
    r = sketch.kmv_setops_report(df, "tag", F.col("k"), k=256).collect()[0]
    # every set fits inside the sketch → all four estimates are EXACT
    assert (r.est_a, r.est_b, r.est_union, r.est_intersect) == (40.0, 50.0, 70.0, 20.0)
    assert (r.true_a, r.true_b, r.true_union, r.true_intersect) == (40, 50, 70, 20)


def test_kmv_report_survives_missing_tag_and_null_keys(spark):
    """A one-sided input must report (not annihilate to zero rows),
    and NULL keys are excluded like count_distinct — a NULL hash
    would otherwise take rank 1 and displace a real minimum."""
    rows = [("a", f"k{i}") for i in range(30)] + [("a", None)]
    df = spark.createDataFrame(rows, "tag string, k string")
    r = sketch.kmv_setops_report(df, "tag", F.col("k"), k=256).collect()
    assert len(r) == 1
    r = r[0]
    assert (r.est_a, r.est_b) == (30.0, 0.0)
    assert (r.true_a, r.true_b, r.true_union, r.true_intersect) == (30, 0, 30, 0)


def test_hll_null_keys_do_not_inflate(spark):
    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)] + [(None,)], "k string"
    )
    clean = spark.createDataFrame([(f"k{i}",) for i in range(50)], "k string")
    got = sketch.hll_report(df, "k").collect()[0]
    want = sketch.hll_report(clean, "k").collect()[0]
    assert got.nonzero_buckets == want.nonzero_buckets
    assert got.hll_estimate == want.hll_estimate
    assert got.true_distinct == want.true_distinct == 50
