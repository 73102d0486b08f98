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
